"""Brute twin for wave 126: GraphBLAS write-mask SpMV."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_masked_spmv_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = e.src.to_numpy(dtype=np.int64)
    d = e.dst.to_numpy(dtype=np.int64)
    w = e.w.to_numpy(dtype=np.float64)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    x = (ar % 11) + 1.0
    y = np.bincount(d, weights=w * x[s], minlength=ctx.n)
    m = (ar % q.MASK_MOD) == 0
    y0 = (ar % q.ACC_MOD).astype(np.float64)
    rep = np.where(m, y, 0.0)
    acc = np.where(m, y0 + y, y0)

    got = q.q_masked_spmv(SF).to_pandas()
    lab = {f"m_{ar[v]}": v for v in range(ctx.n)}
    assert len(got) == ctx.n
    for _, r in got.iterrows():
        v = lab[r.label]
        assert r.y_replace == rep[v]
        assert r.y_accum == acc[v]
    # mask semantics: off-mask rows keep y0 under accumulate, 0 under
    # replace
    off = got.y_replace[~m[[lab[x] for x in got.label]]]
    assert (off == 0.0).all()
