"""Brute twin for wave 148: Voronoi quotient graph.

Independent path: reuse test_wave140's per-landmark BFS assignment,
then count ordered adjacent pairs with Python sets — no SpMM.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_voronoi_quotient_vs_pair_count(ray_session):
    from collections import deque

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

    seeds = {}
    for lm in range(q.VOR_L):
        seeds.setdefault((lm * 7919 + 5) % n, lm)
    best = {}
    for fid, lm in seeds.items():
        dist = {fid: 0}
        dq = deque([fid])
        while dq:
            u = dq.popleft()
            if dist[u] >= q.VOR_ITERS:
                continue
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for i, d in dist.items():
            if i not in best or (d, lm) < best[i]:
                best[i] = (d, lm)

    exp = {}
    for i in range(n):
        if i not in best:
            continue
        for j in nbrs[i]:
            if j in best:
                k = (best[i][1], best[j][1])
                exp[k] = exp.get(k, 0) + 1

    got = q.q_voronoi_quotient(SF).to_pandas()
    assert {(int(r.cell_a), int(r.cell_b)): int(r.n_pairs)
            for _, r in got.iterrows()} == exp
    # A is symmetric, so the quotient must be too
    p = {(int(r.cell_a), int(r.cell_b)): int(r.n_pairs)
         for _, r in got.iterrows()}
    for (a, b), c in p.items():
        assert p.get((b, a)) == c
    # diagonal double-counts each internal undirected edge -> even
    for a in range(q.VOR_L):
        assert p.get((a, a), 0) % 2 == 0
