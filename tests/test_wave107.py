"""Brute twin for wave 107: collective-influence (CI_1) ranking."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_ci_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)  # both orientations, distinct, loop-free
    n = ctx.n
    deg = np.bincount(us, minlength=n).astype(np.int64)
    km1 = np.maximum(deg - 1, 0)
    nb_sum = np.zeros(n, dtype=np.int64)
    np.add.at(nb_sum, us, km1[ud])
    ci = km1 * nb_sum
    ar = np.asarray(ctx.arith, dtype=np.int64)
    order = np.lexsort((ar, -ci))[: q.CI_TOPK_K]

    got = q.q_ci_topk(SF).to_pandas()
    assert list(got.columns) == ["label", "deg", "ci"]
    assert len(got) == q.CI_TOPK_K
    exp_labels = [f"m_{ar[v]}" for v in order]
    assert list(got.label) == exp_labels
    assert list(got.deg.astype(int)) == [int(deg[v]) for v in order]
    assert list(got.ci.astype(int)) == [int(ci[v]) for v in order]
    # CI dominates the plain degree square only through the neighborhood
    # term: every returned ci is at most (deg-1) * (max_deg-1) * deg
    assert (got.ci >= 0).all()
