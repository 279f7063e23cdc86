"""Brute twin for wave 128: repo boilerplate census."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_repo_boilerplate_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    rows = corpus_src.corpus_dataset(n).to_pandas()
    cnt: dict[tuple, int] = {}
    for _, r in rows.iterrows():
        for ln in r.content.split("\n"):
            if ln.startswith("import "):
                cnt[(r.repo, ln)] = cnt.get((r.repo, ln), 0) + 1
    exp: dict[str, list[int]] = {}
    for (repo, _ln), c in cnt.items():
        cur = exp.setdefault(repo, [0, 0, 0])
        cur[0] += c
        cur[1] += 1
        cur[2] = max(cur[2], c)

    got = q.q_repo_boilerplate(SF)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        tot, dst, mx = exp[r.repo]
        assert (int(r.n_imports), int(r.distinct_imports),
                int(r.max_repeat)) == (tot, dst, mx)
    assert (got.max_repeat >= 1).all()
    assert (got.distinct_imports <= got.n_imports).all()
