"""Brute twin for wave 106: densest-subgraph parallel peel."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_densest_peel_vs_brute(ray_session):
    from fractions import Fraction

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)  # both orientations, distinct, loop-free
    n = ctx.n
    act = np.ones(n, dtype=bool)
    trace = []
    for r in range(q.DS_ROUNDS + 1):
        live = act[us] & act[ud]
        deg = np.bincount(us[live], minlength=n)
        nv = int(act.sum())
        ne2 = int(deg[act].sum())
        trace.append((r, nv, ne2 // 2))
        rm = act & (deg * nv <= ne2)
        act = act & ~rm
    got = q.q_densest_peel(SF).to_pandas().sort_values("round")
    assert [(int(r["round"]), int(r.n_v), int(r.n_e))
            for _, r in got.iterrows()] == trace
    # peel is monotone and the density trace contains a maximum that
    # is at least the whole-graph density (the 2-approx witness)
    assert got.n_v.is_monotonic_decreasing
    dens = [Fraction(e, v) if v else Fraction(0) for _, v, e in trace]
    assert max(dens) >= dens[0]
