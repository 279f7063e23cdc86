"""Brute twins for wave 67: CC convergence trace, BFS frontier trace,
whale share."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _und(ctx):
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    return nbrs


def test_cc_convergence_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_cc_convergence_trace(SF).to_pandas().set_index("round")
    ctx = get_context(SF)
    nbrs = _und(ctx)
    l = np.arange(ctx.n, dtype=np.int64)
    for r in range(1, q.CC_ITERS + 1):
        nl = l.copy()
        for v, ns in nbrs.items():
            m = min(l[u] for u in ns)
            if m < nl[v]:
                nl[v] = m
        assert got.loc[r].n_changed == int((nl != l).sum())
        l = nl
    # final labels must match the oracle-green CC query's partition
    per = q.q_connected_components(SF).to_pandas()
    assert per.comp.nunique() == len(np.unique(l))


def test_bfs_frontier_trace_vs_brute(ray_session):
    from collections import deque

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_bfs_frontier_trace(SF).to_pandas()
    ctx = get_context(SF)
    nbrs = _und(ctx)
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
    from collections import Counter

    want = Counter(dist.values())
    assert dict(zip(got.level, got.n_vertices)) == dict(want)


def test_whale_share_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_whale_share(SF).to_pandas()
    ev = _pq("events")
    ev["c"] = np.floor(ev.value * 100 + 0.5).astype(np.int64)
    s = (ev.groupby("user_id").c.sum().reset_index()
           .sort_values(["c", "user_id"], ascending=[False, True]))
    assert got.k[0] == q.WHALE_K
    assert got.topk_cents[0] == int(s.c.head(q.WHALE_K).sum())
    assert got.total_cents[0] == int(s.c.sum())
