"""Brute twin for wave 123: resident block-format census."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_block_format_census_vs_brute(ray_session):
    from combblas_ray.core.engine import _Block
    from combblas_ray.core.partition import chunk_bounds, owner
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    g = q.BFMT_G
    br = owner(ud, ctx.n, g)
    bc = owner(us, ctx.n, g)
    bounds = chunk_bounds(ctx.n, g)
    key = br * g + bc
    uk, cnt = np.unique(key, return_counts=True)
    exp = {}
    for b, nnz in zip(uk, cnt):
        nr = bounds[int(b) // g][1] - bounds[int(b) // g][0]
        fmt = ("hypersparse"
               if nnz and nr > _Block.HYPERSPARSE_RATIO * nnz
               else "csr")
        n, s = exp.get(fmt, (0, 0))
        exp[fmt] = (n + 1, s + int(nnz))

    got = q.q_block_format_census(SF).to_pandas()
    assert {r.fmt: (int(r.n_blocks), int(r.nnz))
            for _, r in got.iterrows()} == exp
    # on a 32x32 grid over this power-law corpus the DCSC-analog must
    # actually engage for some blocks AND plain CSR must survive too
    assert set(got.fmt) == {"csr", "hypersparse"}
