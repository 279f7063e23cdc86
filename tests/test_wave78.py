"""Brute twin for wave 78: the MCL chaos trace re-derived with a dense
numpy implementation of the expand/prune/select/inflate recipe."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_mcl_chaos_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    n = ctx.n
    # columns keyed by src (the pipeline convention): M[:, j] is col j
    M = np.zeros((n, n))
    M[d[keep], s[keep]] = 1.0
    M[s[keep], d[keep]] = 1.0
    M[np.arange(n), np.arange(n)] = 1.0
    M /= M.sum(axis=0)

    want = []
    for _ in range(q.MCLT_ROUNDS):
        E = M @ M
        E /= np.where(E.sum(axis=0) == 0, 1.0, E.sum(axis=0))
        E[E < 1e-4] = 0.0
        # top-50 per column (w DESC, row ASC tie-break); only columns
        # over the cap need the sort
        for j in np.nonzero((E > 0).sum(axis=0) > 50)[0]:
            col = E[:, j]
            nz = np.nonzero(col)[0]
            order = np.lexsort((nz, -col[nz]))
            col[nz[order[50:]]] = 0.0
        E = E ** 2.0
        ssum = E.sum(axis=0)
        E /= np.where(ssum == 0, 1.0, ssum)
        nzc = ssum > 0
        chaos = float((E[:, nzc].max(axis=0)
                       - (E[:, nzc] ** 2).sum(axis=0)).max())
        want.append(chaos)
        M = E
    got = q.q_mcl_chaos_trace(SF).to_pandas()
    assert list(got["round"]) == list(range(1, q.MCLT_ROUNDS + 1))
    assert np.abs(got.chaos.to_numpy() - np.array(want)).max() < 2e-6
    # inflation sharpens columns: chaos contracts between rounds
    assert got.chaos.iloc[-1] < got.chaos.iloc[0]
