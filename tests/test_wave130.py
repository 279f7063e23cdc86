"""Brute twin for wave 130: PageRank damping sensitivity."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _brute_pr(ctx, d, iters):
    e = ctx.edges.to_pandas()
    s = e.src.to_numpy(dtype=np.int64)
    t = e.dst.to_numpy(dtype=np.int64)
    w = e.w.to_numpy(dtype=np.float64)
    n = ctx.n
    ow = np.bincount(s, weights=w, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.bincount(
            t, weights=r[s] * w / ow[s], minlength=n)
        dang = r[ow == 0].sum()
        r = (1.0 - d) / n + d * (contrib + dang / n)
    return r


def test_pr_damping_sensitivity_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    n = ctx.n
    ar = np.asarray(ctx.arith, dtype=np.int64)
    s85 = np.round(_brute_pr(ctx, 0.85, q.PR_ITERS) * n, 6)
    s60 = np.round(_brute_pr(ctx, q.PRDS_D2, q.PR_ITERS) * n, 6)
    o85 = np.lexsort((ar, -s85))
    o60 = np.lexsort((ar, -s60))
    rk85 = np.empty(n, dtype=np.int64)
    rk85[o85] = np.arange(1, n + 1)
    rk60 = np.empty(n, dtype=np.int64)
    rk60[o60] = np.arange(1, n + 1)
    top = o85[: q.PRDS_TOPK]

    got = q.q_pr_damping_sensitivity(SF).to_pandas()
    assert list(got.label) == [f"m_{ar[v]}" for v in top]
    assert np.allclose(got.s085, s85[top], atol=2e-6)
    assert np.allclose(got.s060, s60[top], atol=2e-6)
    assert list(got.rank85.astype(int)) == list(range(1, q.PRDS_TOPK + 1))
    assert list(got.rank60.astype(int)) == [int(rk60[v]) for v in top]
    # the lower damping flattens toward uniform: the top hub keeps
    # rank 1 but with strictly smaller mass
    assert got.s060.iloc[0] < got.s085.iloc[0]
