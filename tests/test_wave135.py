"""Brute twin for wave 135: Watts-Strogatz generator census."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_ws_census_vs_brute(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    pairs = set()
    rewired = 0
    for i in range(n):
        for j in range(1, q.WS_K + 1):
            h = md5_lower64(f"ws:{i}:{j}")
            if h % q.WS_REWIRE_MOD == 0:
                d = (h // q.WS_REWIRE_MOD) % n
                if d == i:
                    d = (d + 1) % n
                rewired += 1
            else:
                d = (i + j) % n
            pairs.add((min(i, d), max(i, d)))
    deg = np.zeros(n, dtype=np.int64)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    have = deg[deg > 0]
    uk, cnt = np.unique(have, return_counts=True)
    exp = dict(zip(uk.tolist(), cnt.tolist()))

    got = q.q_ws_census(SF).to_pandas()
    assert {int(r.deg): int(r.n_vertices)
            for _, r in got.iterrows()} == exp
    # small-world signature: the lattice peak at 2K dominates, and
    # roughly 1/MOD of edges rewired (binomial, loose bounds)
    assert exp.get(2 * q.WS_K, 0) > n // 2
    assert 0.03 < rewired / (n * q.WS_K) < 0.25
