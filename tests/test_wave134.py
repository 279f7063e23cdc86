"""Brute twin for wave 134: PageRank mass by repository."""

import numpy as np

from tests.test_wave130 import _brute_pr

SF = "/root/testdata/sf0.001"


def test_pr_mass_by_repo_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    n = ctx.n
    ar = np.asarray(ctx.arith, dtype=np.int64)
    s = np.round(_brute_pr(ctx, 0.85, q.PR_ITERS) * n, 6)
    rep = ar % 100
    mass = np.bincount(rep, weights=s, minlength=100)
    cnt = np.bincount(rep, minlength=100)
    o = np.lexsort((np.arange(100), -np.round(mass, 6)))[: q.PRREPO_TOPK]

    got = q.q_pr_mass_by_repo(SF).to_pandas()
    assert list(got.repo) == [f"repo_{i}" for i in o]
    assert list(got.n_modules.astype(int)) == [int(cnt[i]) for i in o]
    assert np.allclose(got["mass"], np.round(mass[o], 6), atol=2e-5)
    # mass is conserved: the 100 repos partition all n units of rank
    assert abs(mass.sum() - n) < 1e-2
