"""Brute twin for wave 166: cuckoo-hash feasibility — union-find on
the bucket graph (exact components, no fixed-round labels) plus the
convergence proof that CUCKOO_ROUNDS sufficed at this scale."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_cuckoo_feasibility_vs_union_find(ray_session):
    from collections import deque

    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    import math

    from combblas_ray.functions.text import md5_lower64

    n = corpus_src.n_files_for(SF)
    M = 1 << math.ceil(math.log2(n))
    edges = [(md5_lower64(f"ck1:{i}") % M, md5_lower64(f"ck2:{i}") % M)
             for i in range(n)]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)

    nb, nk = {}, {}
    for x in parent:
        nb[find(x)] = nb.get(find(x), 0) + 1
    for u, _v in edges:
        nk[find(u)] = nk.get(find(u), 0) + 1

    exp = {}
    for root, b in nb.items():
        k = nk.get(root, 0)
        e = k - b
        c, t = exp.get(e, (0, 0))
        exp[e] = (c + 1, t + k)

    # convergence proof: even WITHOUT the pointer-doubling speedup,
    # plain min-label converges within ROUNDS at this eccentricity
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    comp_min = {}
    for x in parent:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    for r, m0 in comp_min.items():
        dist = {m0: 0}
        dq = deque([m0])
        far = 0
        while dq:
            u = dq.popleft()
            far = max(far, dist[u])
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        assert far <= q.CUCKOO_ROUNDS

    got = q.q_cuckoo_feasibility(SF).to_pandas()
    assert {int(r.excess): (int(r.n_components), int(r.n_keys))
            for _, r in got.iterrows()} == exp
    # overloaded table: infeasible mass must exist at load > 1
    assert any(int(r.excess) > 0 for _, r in got.iterrows())
    assert int(got.n_keys.sum()) == n
