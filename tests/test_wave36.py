"""Brute twins for wave 36: triplet violations, peak concurrency,
quantile bins, YoY movers, max type run."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_triplet_violations_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_triplet_violations(SF).to_pandas()
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.TRIP_N].sort_values("vec_id")
    Q = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                           * (1 << 20)).astype(np.int64)
                  for e in emb.embedding])
    lab = emb.label.to_numpy()
    n = v = 0
    for i in range(len(Q)):
        p = nx = -1
        for j in range(i + 1, len(Q)):
            if p < 0 and lab[j] == lab[i]:
                p = j
            if nx < 0 and lab[j] != lab[i]:
                nx = j
            if p >= 0 and nx >= 0:
                break
        if p < 0 or nx < 0:
            continue
        n += 1
        if (Q[i] * Q[p]).sum() <= (Q[i] * Q[nx]).sum():
            v += 1
    assert got.n_triplets[0] == n
    assert got.n_violations[0] == v


def test_peak_concurrency_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_peak_concurrency(SF).to_pandas()
    ev = _pq("events")
    s = ev.ts.astype("datetime64[us]").astype("int64").to_numpy()
    deltas = sorted([(t, 1) for t in s]
                    + [(t + q.CONC_WIN_US, -1) for t in s])
    run = best = 0
    for _, d in deltas:
        run += d
        best = max(best, run)
    assert got.max_concurrent[0] == best


def test_price_quartile_bins_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_price_quartile_bins(SF).to_pandas().set_index("bin")
    li = _pq("lineitem")
    c = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(np.int64)
    v = np.sort(c)
    n = len(v)
    ts = [v[max(1, -(-p * n // 100)) - 1] for p in (25, 50, 75)]
    b = 1 + sum((c > t).astype(int) for t in ts)
    for k in np.unique(b):
        assert got.loc[k, "n"] == int((b == k).sum())
        assert got.loc[k, "sum_cents"] == int(c[b == k].sum())


def test_yoy_movers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_yoy_movers(SF).to_pandas()
    orders = _pq("orders")
    orders["cents"] = np.floor(
        orders.o_totalprice.to_numpy() * 100.0).astype(np.int64)

    def spend(y):
        m = orders[(orders.o_orderdate >= f"{y}-01-01")
                   & (orders.o_orderdate < f"{y + 1}-01-01")]
        return m.groupby("o_custkey").cents.sum()

    sa, sb = spend(q.MOB_YEAR_A), spend(q.MOB_YEAR_B)
    both = sorted(set(sa.index) & set(sb.index))
    rows = sorted(((c, sb[c] - sa[c]) for c in both),
                  key=lambda r: (-abs(r[1]), r[0]))[:q.YOY_TOPK]
    assert list(zip(got.o_custkey, got.delta_cents)) == rows


def test_max_type_run_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_max_type_run(SF).to_pandas().set_index("event_type")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    best = Counter()
    for uid, g in ev.groupby("user_id"):
        run = 0
        prev = None
        for t in g.event_type:
            run = run + 1 if t == prev else 1
            prev = t
            best[t] = max(best[t], run)
    assert dict(zip(got.index, got.max_run)) == dict(best)
