"""Brute twin for wave 118: partition-pruned block-parquet scan."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_block_prune_scan_vs_brute(ray_session):
    from combblas_ray.core.partition import owner
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = e.src.to_numpy(dtype=np.int64)
    d = e.dst.to_numpy(dtype=np.int64)
    w = e.w.to_numpy(dtype=np.float64).astype(np.int64)
    bid = owner(d, ctx.n, q.BPS_G) * q.BPS_G + owner(s, ctx.n, q.BPS_G)
    diag = bid % (q.BPS_G + 1) == 0
    exp = {}
    for b, ww in zip(bid[diag], w[diag]):
        nn, ws = exp.get(int(b), (0, 0))
        exp[int(b)] = (nn + 1, ws + int(ww))

    got = q.q_block_prune_scan(SF).to_pandas()
    assert {int(r.bid): (int(r.nnz), int(r.wsum))
            for _, r in got.iterrows()} == exp
    # the pruned read must only ever surface diagonal block ids
    assert (got.bid.to_numpy() % (q.BPS_G + 1) == 0).all()
