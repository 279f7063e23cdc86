"""Brute twin for wave 116: synchronous ACL PPR push."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_ppr_push_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    root = int(ctx.lookup_id("m_0"))
    deg = np.bincount(us, minlength=n).astype(np.float64)
    r = np.zeros(n)
    r[root] = 1.0
    p = np.zeros(n)
    for _ in range(q.PUSH_ROUNDS):
        a = (deg > 0) & (r > q.PUSH_EPS * deg)
        x = np.where(a, q.PUSH_KEEP * r / np.where(deg > 0, deg, 1.0),
                     0.0)
        y = np.bincount(us, weights=x[ud], minlength=n)
        p = np.where(a, p + q.PUSH_ALPHA * r, p)
        r = np.where(a, q.PUSH_KEEP * r, r) + y

    got = q.q_ppr_push(SF).to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    assert len(got) == n
    lab_p = dict(zip(got.label, got.p))
    lab_r = dict(zip(got.label, got.r))
    for v in range(n):
        lb = f"m_{ar[v]}"
        assert abs(lab_p[lb] - round(float(p[v]), 6)) <= 2e-6
        assert abs(lab_r[lb] - round(float(r[v]), 6)) <= 2e-6
    # ACL mass invariant: p + sum(r) == 1 (every pushed unit splits
    # alpha / keep / spread exactly)
    assert abs(got.p.sum() + got.r.sum() - 1.0) < 1e-3
    assert lab_p[f"m_{ar[root]}"] > 0
