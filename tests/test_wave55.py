"""Brute twins for wave 55: hub asymmetry, dup-graph triangles, loyal
customers, peak-position census, lineitem covariance."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_hub_asymmetry_vs_brute_bfs(ray_session):
    from collections import deque

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_hub_asymmetry(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    out: dict[int, set] = {}
    und: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            out.setdefault(int(s), set()).add(int(d))
            und.setdefault(int(s), set()).add(int(d))
            und.setdefault(int(d), set()).add(int(s))
    deg = np.zeros(ctx.n, dtype=np.int64)
    for v, ns in und.items():
        deg[v] = len(ns)
    S = np.sort(np.lexsort((ar, -deg))[:q.APSP_K])

    def bfs(r):
        dist = {r: 0}
        dq = deque([r])
        while dq:
            u = dq.popleft()
            if dist[u] >= q.BFS_ITERS:
                continue
            for v in out.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    D = {r: bfs(r) for r in S.tolist()}
    sym = asym = oneway = unreach = 0
    for i, a in enumerate(S.tolist()):
        for b in S.tolist()[i + 1:]:
            ab, ba = D[a].get(b), D[b].get(a)
            if ab is None and ba is None:
                unreach += 1
            elif ab is None or ba is None:
                oneway += 1
            elif ab == ba:
                sym += 1
            else:
                asym += 1
    assert (got.n_symmetric[0], got.n_asymmetric[0],
            got.n_oneway[0], got.n_unreachable[0]) == (
        sym, asym, oneway, unreach)
    assert got.n_pairs[0] == sym + asym + oneway + unreach


def test_dupgraph_triangles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = int(q.q_dupgraph_triangles(SF).to_pandas().dup_triangles[0])
    # reuse the query surface for the pair set (oracle-exact already),
    # then count triangles by brute force
    pairs = q.q_jaccard_pairs(SF).to_pandas()
    nbrs: dict[int, set] = {}
    for a, b in zip(pairs.a, pairs.b):
        nbrs.setdefault(int(a), set()).add(int(b))
        nbrs.setdefault(int(b), set()).add(int(a))
    tri = 0
    for u in nbrs:
        for w in nbrs[u]:
            if w <= u:
                continue
            tri += len([v for v in nbrs[u] & nbrs[w] if v > w])
    assert got == tri


def test_loyal_customers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = int(q.q_loyal_customers(SF).to_pandas().n_loyal[0])
    o = _pq("orders")
    o["yr"] = o.o_orderdate.dt.year
    n = 0
    for ck, g in o.groupby("o_custkey"):
        if all(y in set(g.yr) for y in q.LOYAL_YEARS):
            n += 1
    assert got == n


def test_peak_position_vs_brute(ray_session):
    from collections import Counter

    from combblas_ray.pipelines import queries as q

    got = q.q_peak_position(SF).to_pandas()
    ev = _pq("events")
    ev["c"] = np.floor(ev.value * 100 + 0.5).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    cnt = Counter()
    for uid, g in ev.groupby("user_id"):
        v = g.c.to_numpy()
        idx = int(np.argmax(v))
        cnt[idx * q.PEAK_BUCKETS // len(v)] += 1
    assert dict(zip(got.quartile, got.n_users)) == dict(cnt)


def test_lineitem_cov_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lineitem_cov(SF).to_pandas()
    li = _pq("lineitem")
    qv = np.floor(li.l_quantity).astype(np.int64).to_numpy()
    pv = np.floor(li.l_extendedprice * 100 + 0.5).astype(
        np.int64).to_numpy()
    dv = np.floor(li.l_discount * 100 + 0.5).astype(np.int64).to_numpy()
    assert got.n[0] == len(qv)
    assert got.sum_q[0] == qv.sum() and got.sum_p[0] == pv.sum()
    assert got.sum_qp[0] == (qv * pv).sum()
    assert got.sum_pd[0] == (pv * dv).sum()
    assert got.sum_dd[0] == (dv * dv).sum()
