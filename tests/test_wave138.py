"""Brute twin for wave 138: greedy routing on the WS graph."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_greedy_routing_vs_brute(ray_session):
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

    def ring(a, t):
        m = (a - t) % n
        return min(m, n - m)

    exp = []
    for p in range(q.ROUTE_P):
        c = (p * 7919) % n
        t = (p * 104729 + 17) % n
        reached = c == t
        hops = 0
        for h in range(1, q.ROUTE_H + 1):
            if reached:
                break
            c = min(nbrs[c], key=lambda x: (ring(x, t), x))
            hops = h
            if c == t:
                reached = True
        exp.append((p, int(reached),
                    hops if reached else q.ROUTE_H, ring(c, t)))

    got = q.q_greedy_routing(SF).to_pandas().sort_values("pair")
    assert [(int(r.pair), int(r.reached), int(r.hops),
             int(r.final_dist)) for _, r in got.iterrows()] == exp
    # navigability: greedy routing must actually deliver some pairs
    assert int(got.reached.sum()) >= 1
