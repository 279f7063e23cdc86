"""Brute twin for wave 159: DAG transitive reduction with Python sets."""

SF = "/root/testdata/sf0.001"


def test_dag_transitive_vs_sets(ray_session):
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
    dag = {(dense[i], dense[j]) for (i, j) in pairs
           if dense[i] < dense[j]}
    out = {}
    for (s, t) in dag:
        out.setdefault(s, set()).add(t)
    exp = {}
    for (s, t) in dag:
        m = sum(1 for w in out.get(s, ()) if t in out.get(w, ()))
        exp[m] = exp.get(m, 0) + 1

    got = q.q_dag_transitive(SF).to_pandas()
    assert {int(r.two_paths): int(r.n_edges)
            for _, r in got.iterrows()} == exp
    assert int(got.n_edges.sum()) == len(dag)
    # shortcuts exist in this corpus DAG
    assert any(int(r.two_paths) > 0 for _, r in got.iterrows())
