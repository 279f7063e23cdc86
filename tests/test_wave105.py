"""Brute twin for wave 105: the Louvain first sweep."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_louvain_pass_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    w = np.asarray(e.w, dtype=np.float64).astype(np.int64)
    keep = s != d
    n = ctx.n
    # symmetric multiplicity graph
    key = np.concatenate([s[keep] * n + d[keep], d[keep] * n + s[keep]])
    ww = np.concatenate([w[keep], w[keep]])
    uk, inv = np.unique(key, return_inverse=True)
    wsum = np.zeros(len(uk), dtype=np.int64)
    np.add.at(wsum, inv, ww)
    su, dv = uk // n, uk % n
    k = np.zeros(n, dtype=np.int64)
    np.add.at(k, su, wsum)
    m2 = int(wsum.sum())
    comm = np.arange(n, dtype=np.int64)
    for v in range(n):
        rows = np.nonzero(su == v)[0]
        if len(rows) == 0:
            continue
        score = m2 * wsum[rows] - k[v] * k[dv[rows]]
        o = np.lexsort((dv[rows], -score))[0]
        if score[o] > 0:
            comm[v] = dv[rows][o]
    got = q.q_louvain_pass(SF).to_pandas()
    exp_lab = ctx.gather_labels(np.arange(n))
    exp_comm = ctx.gather_labels(comm)
    lut = dict(zip(got.label, got.comm))
    assert len(got) == n
    for lb, cm in zip(exp_lab, exp_comm):
        assert lut[lb] == cm
    # a Louvain sweep on a connected weighted graph moves SOME vertices
    moved = int((comm != np.arange(n)).sum())
    assert moved > 0
    # and every move targets a neighbor (validity of the argmax)
    nbrs = {}
    for a, b in zip(su, dv):
        nbrs.setdefault(int(a), set()).add(int(b))
    for v in np.nonzero(comm != np.arange(n))[0]:
        assert int(comm[v]) in nbrs[int(v)]
