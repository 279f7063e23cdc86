"""Brute twin for wave 153: Voronoi landmark-failure reassignment.

Independent path: per-landmark BFS argmin assignment computed twice
(full landmark set, and with landmark 0 dropped); the redistribution
histogram of cell-0 vertices must match the engine's two composite-BFS
runs.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def _assign(nbrs, n, seeds, cap):
    from collections import deque

    best = {}
    for fid, lm in seeds.items():
        dist = {fid: 0}
        dq = deque([fid])
        while dq:
            u = dq.popleft()
            if dist[u] >= cap:
                continue
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for i, d in dist.items():
            if i not in best or (d, lm) < best[i]:
                best[i] = (d, lm)
    return best


def test_voronoi_failover_vs_double_bfs(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    nbrs = [set() for _ in range(n)]
    for i in range(n):
        tg = [i % 64] + [(i * 101 + t * 4099 + 17) % n
                         for t in range(1, 5) if t <= i % 5]
        for j in tg:
            if j != i:
                nbrs[i].add(j)
                nbrs[j].add(i)

    full_seeds, drop_seeds = {}, {}
    for lm in range(q.VOR_L):
        fid = (lm * 7919 + 5) % n
        full_seeds.setdefault(fid, lm)
        if lm != 0:
            drop_seeds.setdefault(fid, lm)

    full = _assign(nbrs, n, full_seeds, q.VOR_ITERS)
    drop = _assign(nbrs, n, drop_seeds, q.VOR_ITERS)

    exp = {}
    for i, (d, lm) in full.items():
        if lm != 0:
            continue
        nc = drop[i][1] if i in drop else -1
        exp[nc] = exp.get(nc, 0) + 1

    got = q.q_voronoi_failover(SF).to_pandas()
    assert {int(r.new_cell): int(r.n_reassigned)
            for _, r in got.iterrows()} == exp
    # only cell-0 vertices move; everything reassigned lands off-0
    assert 0 not in {int(r.new_cell) for _, r in got.iterrows()}
    assert int(got.n_reassigned.sum()) == sum(exp.values())
