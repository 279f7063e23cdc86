"""Brute twin for wave 156: negative-weight DAG shortest paths —
topological fold with Python ints, plus the shift-commutation check."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_dag_negative_sssp_vs_topo_fold(ray_session):
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
    labels = sorted(f"m_{i}" for i in range(n))
    dense = {int(lb[2:]): r for r, lb in enumerate(labels)}
    inc = {}
    for (i, j) in pairs:
        if dense[i] < dense[j]:
            ln = 1 + (i + 2 * j) % 7 - q.NEG_SHIFT
            inc.setdefault(dense[j], []).append((dense[i], ln))

    dist = np.zeros(n, dtype=np.int64)
    for v in range(n):  # dense order IS a topological order
        for s, ln in inc.get(v, ()):
            if dist[s] + ln < dist[v]:
                dist[v] = dist[s] + ln

    u, cnt = np.unique(dist, return_counts=True)
    got = q.q_dag_negative_sssp(SF).to_pandas().sort_values("dist")
    assert got["dist"].tolist() == u.tolist()
    assert got["cnt"].tolist() == cnt.tolist()
    # negative edges actually produce negative path costs
    assert int(dist.min()) < 0
