"""Brute twin for wave 110: H-index coreness iteration."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def _hindex(vals: np.ndarray) -> int:
    vals = np.sort(vals)[::-1]
    rn = np.arange(1, len(vals) + 1)
    return int(np.maximum.reduceat(np.minimum(vals, rn), [0])[0]) \
        if len(vals) else 0


def test_hindex_coreness_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    deg = np.bincount(us, minlength=n).astype(np.int64)
    nbrs = [[] for _ in range(n)]
    for a, b in zip(us, ud):
        nbrs[a].append(b)
    c = deg.copy()
    for _ in range(q.HIDX_ROUNDS):
        c = np.array([_hindex(c[nbrs[v]]) if deg[v] else 0
                      for v in range(n)], dtype=np.int64)
    have = np.nonzero(deg > 0)[0]

    got = q.q_hindex_coreness(SF).to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    assert len(got) == len(have)
    lab_to_v = {f"m_{ar[v]}": v for v in have}
    for _, r in got.iterrows():
        v = lab_to_v[r.label]
        assert int(r.deg) == int(deg[v])
        assert int(r.core) == int(c[v])
    # h-operator invariants: 1 <= core <= deg, and the iterate is a
    # monotone upper bound on the true coreness (exact at fixpoint)
    assert (got.core >= 1).all() and (got.core <= got.deg).all()
