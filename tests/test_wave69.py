"""Brute twins for wave 69: busy hours, BFS level cut."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_busy_minutes_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_busy_minutes(SF).to_pandas()
    ev = _pq("events")
    hr = (ev.ts.astype("datetime64[us]").astype("int64")
          // 3_600_000_000)
    per = ev.assign(hr=hr).groupby(["event_type", "hr"]).size()
    want = {}
    for et, g in per.groupby(level=0):
        n = int((g >= q.BUSY_K).sum())
        if n:
            want[et] = n
    assert dict(zip(got.event_type, got.n_busy_minutes)) == want


def test_bfs_level_cut_vs_brute(ray_session):
    from collections import deque

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_bfs_level_cut(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    root = ctx.lookup_id("m_0")
    dist = {root: 0}
    dq = deque([root])
    while dq:
        u = dq.popleft()
        if dist[u] >= q.BFS_ITERS:
            continue
        for v in nbrs.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    same = cross = unreached = 0
    for u, ns in nbrs.items():
        for v in ns:
            if u < v:
                lu, lv = dist.get(u), dist.get(v)
                if lu is None or lv is None:
                    unreached += 1
                elif lu == lv:
                    same += 1
                else:
                    cross += 1
                    assert abs(lu - lv) == 1  # BFS level property
    assert (got.n_same[0], got.n_cross[0],
            got.n_unreached[0]) == (same, cross, unreached)
