"""Brute twin for wave 83: the 2D grid census — manifest nnz counts vs
a direct replay of the owner rule over the dense-id edge table."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_grid_census_vs_brute(ray_session):
    from combblas_ray.core.partition import local_size, owner
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    eng = ctx.engine("directed")
    g = eng.g
    e = ctx.edges.to_pandas()
    src = np.asarray(e.src, dtype=np.int64)
    dst = np.asarray(e.dst, dtype=np.int64)
    br = owner(dst, ctx.n, g)
    bc = owner(src, ctx.n, g)
    want: dict[tuple, int] = {}
    for a, b in zip(br, bc):
        want[(int(a), int(b))] = want.get((int(a), int(b)), 0) + 1
    got = q.q_grid_census(SF).to_pandas()
    assert {(r.br, r.bc): r.nnz for r in got.itertuples()} == want
    # totals = distinct directed pairs; layout balance sanity
    assert got.nnz.sum() == len(src)
    assert local_size(ctx.n, g) * g <= ctx.n + g
