"""Brute twins for wave 101: R-MAT generator audits — an independent
scalar re-implementation of the counter-hash draw verifies the
vectorized generator bit for bit."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _mix64_scalar(x: int) -> int:
    m = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & m
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
    return z ^ (z >> 31)


def _brute_edges(scale, ef, seed):
    a, b, c = 0.57, 0.19, 0.19
    edges = []
    for e in range(ef * (1 << scale)):
        u = v = 0
        for bit in range(scale):
            h = _mix64_scalar((e * 2654435761 + seed * 1_000_003 + bit)
                              & ((1 << 64) - 1))
            r = (h >> 11) / float(1 << 53)
            q = 0 if r < a else (1 if r < a + b
                                 else (2 if r < a + b + c else 3))
            u = (u << 1) | (q >> 1)
            v = (v << 1) | (q & 1)
        edges.append((u, v))
    return edges


def test_rmat_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    edges = _brute_edges(q.RMAT_AUDIT_SCALE, q.RMAT_AUDIT_EF,
                         q.RMAT_AUDIT_SEED)
    dis = {(u, v) for u, v in edges if u != v}
    touched = {u for u, _v in dis} | {v for _u, v in dis}
    got = q.q_rmat_census(SF).to_pandas().iloc[0]
    assert int(got.n_edges) == len(edges)
    assert int(got.n_loops) == sum(1 for u, v in edges if u == v)
    assert int(got.n_distinct) == len(dis)
    assert int(got.n_touched) == len(touched)


def test_rmat_deg_hist_vs_brute(ray_session):
    from collections import Counter

    from combblas_ray.pipelines import queries as q

    edges = _brute_edges(q.RMAT_AUDIT_SCALE, q.RMAT_AUDIT_EF,
                         q.RMAT_AUDIT_SEED)
    dis = {(u, v) for u, v in edges if u != v}
    deg = Counter(u for u, _v in dis)
    hist = Counter(deg.values())
    got = q.q_rmat_deg_hist(SF).to_pandas().sort_values("outdeg")
    assert {int(d): int(n) for d, n in
            zip(got.outdeg, got.n_vertices)} == dict(hist)
    # power-law signature: the degree-1 class dominates
    assert hist[1] == max(hist.values())


def test_rmat_quadrants_vs_brute(ray_session):
    from collections import Counter

    from combblas_ray.pipelines import queries as q

    sc = q.RMAT_AUDIT_SCALE
    edges = _brute_edges(sc, q.RMAT_AUDIT_EF, q.RMAT_AUDIT_SEED)
    quad = Counter((u >> (sc - 1), v >> (sc - 1)) for u, v in edges)
    got = q.q_rmat_quadrants(SF).to_pandas()
    assert {(int(r.qu), int(r.qv)): int(r.n_edges)
            for _, r in got.iterrows()} == dict(quad)
    # initiator skew: the (0,0) quadrant holds the most edges
    assert quad[(0, 0)] == max(quad.values())
    n = len(edges)
    # and roughly the initiator share (0.57 of mass at the top level)
    assert abs(quad[(0, 0)] / n - 0.57) < 0.05
