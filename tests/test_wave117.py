"""Brute twin for wave 117: single-source edge betweenness."""

from collections import deque

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_edge_betweenness_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    root = int(ctx.lookup_id("m_0"))
    nbrs = [[] for _ in range(n)]
    for a, b in zip(us, ud):
        nbrs[a].append(b)
    # BFS truncated at EB_ITERS levels, exact sigma, Brandes delta
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.int64)
    dist[root], sigma[root] = 0, 1
    frontier = [root]
    for lvl in range(1, q.EB_ITERS + 1):
        nxt = {}
        for v in frontier:
            for w in nbrs[v]:
                if dist[w] < 0 or dist[w] == lvl:
                    if dist[w] < 0:
                        dist[w] = lvl
                        nxt[w] = True
                    sigma[w] += sigma[v]
        frontier = list(nxt)
    delta = np.zeros(n)
    for lvl in range(q.EB_ITERS, 0, -1):
        for v in np.nonzero(dist == lvl - 1)[0]:
            acc = 0.0
            for w in nbrs[v]:
                if dist[w] == lvl:
                    acc += (1.0 + delta[w]) / sigma[w]
            delta[v] += acc * sigma[v]
    # DAG edge scores
    rows = []
    for a, b in zip(us, ud):
        if dist[a] >= 0 and dist[b] == dist[a] + 1:
            rows.append((a, b,
                         sigma[a] / sigma[b] * (1.0 + delta[b])))
    rows.sort(key=lambda t: (-t[2], t[0], t[1]))
    exp = rows[: q.EB_TOPK]

    got = q.q_edge_betweenness(SF).to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    assert len(got) == len(exp)
    for (a, b, sc), (_, r) in zip(exp, got.iterrows()):
        assert r.src_label == f"m_{ar[a]}"
        assert r.dst_label == f"m_{ar[b]}"
        assert abs(r.score - round(sc, 6)) <= 2e-6
    # Girvan-Newman sanity: scores are positive and the top edge
    # touches the BFS tree below the root
    assert (got.score > 0).all()
