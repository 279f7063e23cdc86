"""Brute twins for wave 93: non-backtracking walk trace, diamond count,
tailed triangles. The NBT brute is the INDEPENDENT edge-space Hashimoto
DP (state on directed edges), verifying the vertex-space recurrence the
query uses from the other side."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def _tri_set(us, ud):
    """All triangles a < m < c of the undirected simple graph."""
    adj = {}
    for a, b in zip(us, ud):
        if a < b:
            adj.setdefault(int(a), set()).add(int(b))
    tris = []
    for a, nbrs in adj.items():
        for m in nbrs:
            for c in adj.get(m, ()):
                if c in nbrs:
                    tris.append((a, m, c))
    return tris


def test_nbt_trace_vs_edge_dp(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)  # both orientations, loop-free, dedup'd
    m2 = len(us)  # number of directed edges = 2m
    # Hashimoto DP: w[e] = # non-backtracking walks of length k whose
    # LAST step is directed edge e = (u -> v); extend e by any v -> w
    # with w != u.
    eid = {(int(u), int(v)): i for i, (u, v) in enumerate(zip(us, ud))}
    out_edges = {}
    for i, (u, v) in enumerate(zip(us, ud)):
        out_edges.setdefault(int(u), []).append(i)
    w = np.ones(m2, dtype=np.int64)
    totals = [int(w.sum())]  # k = 1
    for _ in range(q.NBT_T - 1):
        nxt = np.zeros(m2, dtype=np.int64)
        for i, (u, v) in enumerate(zip(us, ud)):
            for j in out_edges.get(int(v), ()):
                if ud[j] != u:  # no immediate reversal
                    nxt[j] += w[i]
        w = nxt
        totals.append(int(w.sum()))
    got = q.q_nbt_trace(SF).to_pandas().sort_values("k")
    assert got.walks.tolist() == totals
    # closed-form invariants
    deg = np.bincount(us, minlength=ctx.n)
    assert totals[0] == m2
    assert totals[1] == int((deg * (deg - 1)).sum())


def test_diamond_count_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    tris = _tri_set(us, ud)
    from collections import Counter

    sup = Counter()
    for a, m, c in tris:
        sup[(a, m)] += 1
        sup[(a, c)] += 1
        sup[(m, c)] += 1
    got = q.q_diamond_count(SF).to_pandas().iloc[0]
    assert int(got.n_triangles) == len(tris)
    assert int(got.n_sup_edges) == len(sup)
    assert int(got.n_diamonds) == sum(s * (s - 1) // 2
                                      for s in sup.values())
    assert int(got.max_support) == max(sup.values())


def test_tailed_triangles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    tris = _tri_set(us, ud)
    deg = np.bincount(us, minlength=ctx.n).astype(np.int64)
    tv = np.zeros(ctx.n, dtype=np.int64)
    for t in tris:
        for v in t:
            tv[v] += 1
    got = q.q_tailed_triangles(SF).to_pandas().iloc[0]
    assert int(got.n_triangles) == len(tris)
    assert int(got.n_tailed) == int((tv * (deg - 2)).sum())
