"""Brute twins for wave 98: route balance, table profile, hub 2-ball
Jaccard."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_route_balance_vs_brute(ray_session):
    from combblas_ray.core.shuffle import _mix64
    from combblas_ray.pipelines import queries as q

    keys = np.asarray(pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey"]).column("l_orderkey"), dtype=np.int64)
    h = _mix64(_mix64(keys.view(np.uint64)))
    p = (h >> np.uint64(33)).astype(np.int64) % q.ROUTE_G
    exp = np.bincount(p, minlength=q.ROUTE_G)
    got = q.q_route_balance(SF).to_pandas().sort_values("bucket")
    assert got.rows.to_numpy().tolist() == exp.tolist()
    assert int(got.rows.sum()) == len(keys)
    # the balance property the engine relies on: no empty bucket and
    # bounded imbalance on this uniform key set
    assert int(got.rows.min()) > 0
    assert got.rows.max() / max(got.rows.mean(), 1) < 2.0


def test_table_profile_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_table_profile(SF).to_pandas()
    for tbl, cols in q.PROFILE_TABLES.items():
        t = pq.read_table(f"{SF}/{tbl}.parquet", columns=cols)
        for c in cols:
            col = t.column(c)
            row = got[(got.tbl == tbl) & (got.col == c)].iloc[0]
            assert int(row.n_rows) == t.num_rows
            assert int(row.n_nulls) == col.null_count
            vals = [v for v in col.to_pylist() if v is not None]
            assert int(row.n_distinct) == len(set(vals))


def test_ball2_jaccard_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    deg = np.bincount(us, minlength=n)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    hubs = np.lexsort((ar, -deg))[:3]
    adj = [[] for _ in range(n)]
    for a, b in zip(us, ud):
        adj[a].append(b)
    balls = []
    for h in hubs:
        b1 = {int(h)} | set(adj[h])
        b2 = set(b1)
        for v in b1:
            b2.update(adj[v])
        balls.append(b2)
    labs = ctx.gather_labels(np.asarray(hubs, dtype=np.int64))
    got = q.q_ball2_jaccard(SF).to_pandas()
    exp = {(labs[a], labs[b]): (len(balls[a]), len(balls[b]),
                                len(balls[a] & balls[b]))
           for a, b in [(0, 1), (0, 2), (1, 2)]}
    assert len(got) == 3
    for _, r in got.iterrows():
        na, nb, it = exp[(r.la, r.lb)]
        assert (int(r.na), int(r.nb), int(r.inter)) == (na, nb, it)
        # an intersection never exceeds either ball
        assert it <= min(na, nb)
