"""Brute twins for wave 91: hub closed-walk returns, threshold
cascade, Holt trend."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_hub_walk_returns_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    deg = np.bincount(np.concatenate([us, ud]), minlength=n)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    hub = int(np.lexsort((ar, -deg))[0])
    x = np.zeros(n, dtype=np.int64)
    x[hub] = 1
    exp = []
    # _und returns BOTH orientations, so one scatter per step is A·x
    for _ in range(q.WALK_T):
        y = np.zeros(n, dtype=np.int64)
        np.add.at(y, us, x[ud])
        x = y
        exp.append(int(x[hub]))
    got = q.q_hub_walk_returns(SF).to_pandas().sort_values("t")
    assert got.walks.tolist() == exp
    # structural invariants: no loops => c1 = 0; c2 = deg(hub)
    assert exp[0] == 0
    assert exp[1] == int(deg[hub]) // 2  # deg counts both orientations


def test_threshold_cascade_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    ar = np.asarray(ctx.arith, dtype=np.int64)
    act = (ar % q.CASC_MOD == 0)
    exp = [int(act.sum())]
    # _und returns both orientations: one scatter = active-nbr counts
    for _ in range(q.CASC_ROUNDS):
        y = np.zeros(n, dtype=np.int64)
        np.add.at(y, us, act[ud].astype(np.int64))
        act = act | (y >= q.CASC_THETA)
        exp.append(int(act.sum()))
    got = q.q_threshold_cascade(SF).to_pandas().sort_values("round")
    assert got.n_active.tolist() == exp
    # monotone non-decreasing activation, and the cascade must spread
    assert all(b >= a for a, b in zip(exp, exp[1:]))
    assert exp[-1] > exp[0]


def test_holt_trend_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).column("ts")
    day = (np.asarray(ts).astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    lo, hi = int(day.min()), int(day.max())
    x = np.bincount(day - lo, minlength=hi - lo + 1).astype(np.int64)
    a = q.HOLT_A_NUM / q.HOLT_A_DEN
    be = q.HOLT_B_NUM / q.HOLT_B_DEN
    lev = np.empty(len(x))
    tr = np.empty(len(x))
    lev[0] = float(x[0])
    tr[0] = float(x[1] - x[0])
    for t in range(1, len(x)):
        lev[t] = a * x[t] + (1.0 - a) * (lev[t - 1] + tr[t - 1])
        tr[t] = be * (lev[t] - lev[t - 1]) + (1.0 - be) * tr[t - 1]
    got = q.q_holt_trend(SF).to_pandas().sort_values("day")
    assert np.array_equal(got.cnt.to_numpy(), x)
    assert np.array_equal(got.level_u.to_numpy(),
                          np.floor(lev * 1e6 + 0.5).astype(np.int64))
    assert np.array_equal(got.trend_u.to_numpy(),
                          np.floor(tr * 1e6 + 0.5).astype(np.int64))
    # the level tracks the series: its mean sits inside the data range
    assert x.min() <= lev.mean() <= x.max()
