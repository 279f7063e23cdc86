"""Brute twin for wave 79: the BFS direction-switch (Beamer rule)
trace, replayed from exact numpy level sets."""

from collections import deque

import numpy as np

SF = "/root/testdata/sf0.001"


def test_bfs_dir_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    n = ctx.n
    m = sum(len(v) for v in nbrs.values())  # directed stored entries
    deg = {v: len(ns) for v, ns in nbrs.items()}

    root = int(np.asarray(ctx.lookup_id("m_0")))
    dist = {root: 0}
    dq = deque([root])
    while dq:
        u = dq.popleft()
        for v in nbrs.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    levels: dict[int, list] = {}
    for v, dv in dist.items():
        levels.setdefault(dv, []).append(v)

    want = []
    m_rem = m
    lmax = max(levels)
    for lv in sorted(levels):
        fsize = len(levels[lv])
        fedges = sum(deg.get(v, 0) for v in levels[lv])
        m_rem -= fedges
        if lv + 1 > q.BFS_ITERS:
            break
        top_down = fsize * 50 < n and fedges * 4 < m_rem
        want.append((lv + 1, fsize, fedges, m_rem, 0 if top_down else 1))
    got = q.q_bfs_dir_trace(SF).to_pandas()
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    # the last decision row sees the final (possibly empty-step) frontier
    assert len(got) == min(lmax + 1, q.BFS_ITERS)
