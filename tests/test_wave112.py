"""Brute twin for wave 112: truncated absorbing-walk hitting time."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_hitting_time_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    ar = np.asarray(ctx.arith, dtype=np.int64)
    seed = (ar % q.HIT_SEED_MOD) == 0
    deg = np.bincount(us, minlength=n).astype(np.float64)
    h = np.zeros(n)
    for _ in range(q.HIT_ROUNDS):
        y = np.bincount(us, weights=h[ud], minlength=n)
        h = np.where(deg > 0, 1.0 + y / np.where(deg > 0, deg, 1.0), 0.0)
        h[seed] = 0.0

    got = q.q_hitting_time(SF).to_pandas()
    assert len(got) == n
    lab_to_h = dict(zip(got.label, got.h))
    exp = {f"m_{ar[v]}": round(float(h[v]), 6) for v in range(n)}
    bad = [k for k in exp
           if abs(lab_to_h[k] - exp[k]) > 2e-6]
    assert not bad, bad[:5]
    # absorbing invariants: seeds sit at 0; every non-seed with a path
    # to a seed inside the horizon has h >= 1
    for v in np.nonzero(seed)[0][:50]:
        assert lab_to_h[f"m_{ar[v]}"] == 0.0
    nz = got.h.to_numpy()
    assert ((nz == 0.0) | (nz >= 1.0)).all()
