"""Brute twin for wave 109: ego-net scan statistic top-k."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_scan_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    deg = np.bincount(us, minlength=n).astype(np.int64)
    # brute per-vertex triangles: for each undirected pair (a < b),
    # common neighbors c close a triangle crediting all three corners
    nbrs = [set() for _ in range(n)]
    for a, b in zip(us, ud):
        nbrs[a].add(b)
    tri = np.zeros(n, dtype=np.int64)
    for a in range(n):
        for b in nbrs[a]:
            if b <= a:
                continue
            common = nbrs[a] & nbrs[b]
            for c in common:
                if c > b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    scan = deg + tri
    have = np.nonzero(deg > 0)[0]
    o = have[np.lexsort((have, -scan[have]))][: q.SCAN_TOPK_K]

    got = q.q_scan_topk(SF).to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    assert list(got.columns) == ["label", "deg", "tri", "scan"]
    assert list(got.label) == [f"m_{ar[v]}" for v in o]
    assert list(got.deg.astype(int)) == [int(deg[v]) for v in o]
    assert list(got.tri.astype(int)) == [int(tri[v]) for v in o]
    assert list(got["scan"].astype(int)) == [int(scan[v]) for v in o]
