"""Brute twin for wave 136: BFS trace over the generated WS graph."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_ws_bfs_trace_vs_brute(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    nbrs: dict[int, set] = {i: set() for i in range(n)}
    for i in range(n):
        for j in range(1, q.WS_K + 1):
            h = md5_lower64(f"ws:{i}:{j}")
            if h % q.WS_REWIRE_MOD == 0:
                d = (h // q.WS_REWIRE_MOD) % n
                if d == i:
                    d = (d + 1) % n
            else:
                d = (i + j) % n
            nbrs[i].add(d)
            nbrs[d].add(i)
    dist = {0: 0}
    frontier = [0]
    trace = [(0, 1)]
    for r in range(1, q.WSB_ROUNDS + 1):
        nxt = []
        for v in frontier:
            for w in nbrs[v]:
                if w not in dist:
                    dist[w] = r
                    nxt.append(w)
        frontier = nxt
        trace.append((r, len(dist)))

    got = q.q_ws_bfs_trace(SF).to_pandas().sort_values("round")
    assert [(int(r["round"]), int(r.n_reached))
            for _, r in got.iterrows()] == trace
    # the small-world property: reach at 8 hops far exceeds the pure
    # lattice cone (2*K*8 + 1 vertices)
    assert trace[-1][1] > 2 * q.WS_K * q.WSB_ROUNDS + 1
