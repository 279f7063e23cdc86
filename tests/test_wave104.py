"""Brute twin for wave 104: K-hop cheapest paths under negative
integer weights (Bellman-Ford face)."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_khop_cheapest_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(s[keep] * ctx.n + d[keep])
    s2, d2 = key // ctx.n, key % ctx.n
    w = ((s2 + 2 * d2) % 7 - 3).astype(np.float64)
    assert (w < 0).any() and (w > 0).any()  # genuinely mixed signs
    n = ctx.n
    # hub: structural undirected degree DESC, arith ASC
    us = np.concatenate([s2, d2])
    ud = np.concatenate([d2, s2])
    uk = np.unique(us * n + ud)
    deg = np.bincount(uk // n, minlength=n)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    hub = int(np.lexsort((ar, -deg))[0])
    dist = np.full(n, np.inf)
    dist[hub] = 0.0
    got = q.q_khop_cheapest(SF).to_pandas().sort_values("k")
    for k in range(1, q.BF_ROUNDS + 1):
        y = np.full(n, np.inf)
        np.minimum.at(y, d2, dist[s2] + w)
        dist = np.minimum(dist, y)
        reach = np.isfinite(dist)
        row = got.iloc[k - 1]
        assert int(row.k) == k
        assert int(row.n_reached) == int(reach.sum())
        assert int(row.min_dist) == int(dist[reach].min())
        assert int(row.sum_dist) == int(round(dist[reach].sum()))
    # with negative edges the k-hop optimum can KEEP dropping
    assert got.min_dist.iloc[-1] <= got.min_dist.iloc[0]
    assert got.n_reached.is_monotonic_increasing
