"""Brute twin for wave 85: first-round MCL prune/select counts."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_mcl_prune_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    n = ctx.n
    M = np.zeros((n, n))
    M[d[keep], s[keep]] = 1.0
    M[s[keep], d[keep]] = 1.0
    M[np.arange(n), np.arange(n)] = 1.0
    M /= M.sum(axis=0)
    E = M @ M
    nnz_expanded = int((E > 0).sum())
    En = E / E.sum(axis=0)
    nnz_pruned = int((En >= 1e-4).sum())
    Ep = np.where(En >= 1e-4, En, 0.0)
    nnz_selected = int(np.minimum((Ep > 0).sum(axis=0), 50).sum())
    got = q.q_mcl_prune_stats(SF).to_pandas().iloc[0]
    assert got["round"] == 1
    assert got.nnz_expanded == nnz_expanded
    assert got.nnz_pruned == nnz_pruned
    assert got.nnz_selected == nnz_selected
    # the funnel only narrows
    assert nnz_expanded >= nnz_pruned >= nnz_selected
