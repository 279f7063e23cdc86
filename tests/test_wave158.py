"""Brute twin for wave 158: repo-disjoint split audit."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_group_split_vs_python_ints(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    per_repo = {}
    for i in range(n):
        per_repo[i % 100] = per_repo.get(i % 100, 0) + 1
    exp = {}
    for r, nf in per_repo.items():
        s = (r * 2654435761) % q.GSPLIT_MOD
        split = "train" if s < 8 else ("val" if s == 8 else "test")
        nr, tot = exp.get(split, (0, 0))
        exp[split] = (nr + 1, tot + nf)

    got = q.q_group_split(SF).to_pandas()
    assert {r.split: (int(r.n_repos), int(r.n_files))
            for _, r in got.iterrows()} == exp
    # group integrity: repo counts across splits sum to all 100 repos,
    # so no repo was double-counted into two splits
    assert int(got.n_repos.sum()) == len(per_repo)
    assert int(got.n_files.sum()) == n
    # 8/1/1-ish proportions actually materialize
    assert exp["train"][1] > exp["val"][1]
    assert exp["train"][1] > exp["test"][1]
