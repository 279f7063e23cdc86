"""Brute twin for wave 143: weighted critical path on the DAG.

Independent path: regenerate edges, build the dense-label-order DAG,
TOPOLOGICALLY sort (no fixed-round relaxation) and fold earliest-finish
times with a plain dict — also proves CP_ITERS rounds suffice.
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_critical_path_vs_topo_fold(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    pairs = set()
    for i in range(n):
        tg = [i % 64] + [(i * 101 + t * 4099 + 17) % n
                         for t in range(1, 5) if t <= i % 5]
        for j in tg:
            if j != i:
                pairs.add((i, j))
    # dense order = label-lexicographic rank
    labels = sorted(f"m_{i}" for i in range(n))
    dense = {int(lb[2:]): r for r, lb in enumerate(labels)}
    dag = {}  # dense edge -> len (from FILE ids)
    for (i, j) in pairs:
        if dense[i] < dense[j]:
            dag[(dense[i], dense[j])] = 1 + (i + 2 * j) % 7

    ef = np.zeros(n, dtype=np.int64)
    # topological order over the acyclic orientation = dense id order
    inc = {}
    for (s, t), ln in dag.items():
        inc.setdefault(t, []).append((s, ln))
    hops = np.zeros(n, dtype=np.int64)
    for v in range(n):
        for s, ln in inc.get(v, ()):
            if ef[s] + ln > ef[v]:
                ef[v] = ef[s] + ln
            hops[v] = max(hops[v], hops[s] + 1)
    assert int(hops.max()) <= q.CP_ITERS, "CP_ITERS bound violated"

    u, cnt = np.unique(ef, return_counts=True)
    got = q.q_critical_path(SF).to_pandas().sort_values("ef")
    assert got["ef"].tolist() == u.tolist()
    assert got["cnt"].tolist() == cnt.tolist()
    assert int(ef.max()) > 0
