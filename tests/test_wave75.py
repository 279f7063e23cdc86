"""Brute twins for wave 75: truncated Estrada subgraph centrality and
the closed-walk traces, re-derived with a dense numpy adjacency."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _adj(ctx):
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    # float64 so the matmuls hit BLAS (int64 matmul is a slow generic
    # loop); counts here are far below 2^53 so values stay exact
    A = np.zeros((ctx.n, ctx.n), dtype=np.float64)
    A[s[keep], d[keep]] = 1.0
    A[d[keep], s[keep]] = 1.0
    return A


def test_estrada_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    A = _adj(ctx)
    A2 = A @ A
    d2 = np.diag(A2).astype(np.int64)
    d3 = np.einsum("ij,ji->i", A2, A).astype(np.int64)
    d4 = (A2 * A2).sum(axis=1).astype(np.int64)  # diag(A^4) by symmetry
    sc = 1.0 + d2 / 2.0 + d3 / 6.0 + d4 / 24.0
    labels = np.asarray(ctx.gather_labels(np.arange(ctx.n))).astype(str)
    want = dict(zip(labels, sc))
    got = q.q_estrada_trunc(SF).to_pandas()
    assert len(got) == ctx.n
    assert np.abs(got.sc.to_numpy()
                  - np.array([want[lb] for lb in got.label])).max() < 2e-6

    w = q.q_closed_walks234(SF).to_pandas().iloc[0]
    assert w.w2 == int(d2.sum())
    assert w.w3 == int(d3.sum())
    assert w.w4 == int(d4.sum())
    # structural identities: tr(A^2) = 2m, tr(A^3) = 6 * triangles
    assert w.w2 == int(A.sum())
    assert w.w3 % 6 == 0
