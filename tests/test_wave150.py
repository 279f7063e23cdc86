"""Brute twin for wave 150: landmark distance-oracle audit — plain
BFS dict walks in file-id space, no SpMM, no dictionary."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _bfs(nbrs, src, cap):
    from collections import deque

    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if dist[u] >= cap:
            continue
        for v in nbrs[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


def test_landmark_audit_vs_plain_bfs(ray_session):
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

    lm_d = [_bfs(nbrs, (lm * 7919 + 5) % n, q.BFS_ITERS)
            for lm in range(q.VOR_L)]
    got = q.q_landmark_dist_audit(SF).to_pandas().sort_values("pair")
    for _, r in got.iterrows():
        p = int(r.pair)
        s, t = (p * 7919 + 3) % n, (p * 104729 + 31) % n
        true_d = _bfs(nbrs, s, q.BFS_ITERS).get(t, -1)
        est = min((d.get(s, np.inf) + d.get(t, np.inf) for d in lm_d),
                  default=np.inf)
        est = int(est) if np.isfinite(est) else -1
        assert (int(r.true_d), int(r.est_d)) == (true_d, est)
        # triangle inequality: the landmark estimate never undershoots
        if true_d >= 0 and est >= 0:
            assert est >= true_d
