"""Brute twin for wave 84: the EstimateFLOP planning metrics."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_spgemm_flops_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(np.concatenate([s[keep] * ctx.n + d[keep],
                                    d[keep] * ctx.n + s[keep]]))
    us, ud = key // ctx.n, key % ctx.n
    deg = np.bincount(us, minlength=ctx.n).astype(np.int64)
    flops = int((deg * deg).sum())
    # distinct product coordinates via dense boolean matmul
    A = np.zeros((ctx.n, ctx.n), dtype=np.float64)
    A[us, ud] = 1.0
    nnz_c = int(((A @ A) > 0).sum())
    got = q.q_spgemm_flops(SF).to_pandas().iloc[0]
    assert got.flops == flops
    assert got.nnz_c == nnz_c
    assert abs(got.compression - round(flops / nnz_c, 6)) < 1e-9
    # every product coordinate takes at least one multiply
    assert got.flops >= got.nnz_c
