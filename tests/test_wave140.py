"""Brute twin for wave 140: graph Voronoi landmark partition.

Independent path: regenerate the corpus edge list, run a plain BFS
from EACH landmark separately, assign cells by (dist, landmark) argmin
— no composite encoding — and compare cell stats.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_voronoi_vs_per_landmark_bfs(ray_session):
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

    best = {}  # i -> (dist, lm)
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
    for i, (d, lm) in best.items():
        c, s, e = exp.get(lm, (0, 0, 0))
        exp[lm] = (c + 1, s + d, max(e, d))

    got = q.q_voronoi_cells(SF).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        lm = int(r.landmark)
        assert exp[lm] == (int(r.cell_size), int(r.dist_sum), int(r.ecc))
        fid = [f for f, l in seeds.items() if l == lm][0]
        assert r.seed_label == f"m_{fid}"
    # the partition covers every reached vertex exactly once
    assert int(got.cell_size.sum()) == len(best)
