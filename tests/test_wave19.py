"""Brute twins for wave 19: bipartite projection, priority sample,
TPC-H Q21, double-sweep BFS, positional token search."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_bipartite_proj_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_bipartite_proj(SF).to_pandas()
    ev = _pq("events")
    ut = ev[["user_id", "event_type"]].drop_duplicates()
    cnt = Counter()
    for _, g in ut.groupby("user_id"):
        ts = sorted(g.event_type)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                cnt[(ts[i], ts[j])] += 1
    want = pd.DataFrame(
        [(a, b, c) for (a, b), c in sorted(cnt.items())],
        columns=["t1", "t2", "users"])
    pd.testing.assert_frame_equal(
        got.sort_values(["t1", "t2"]).reset_index(drop=True), want,
        check_dtype=False)


def test_priority_sample_vs_brute(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q

    got = q.q_priority_sample(SF).to_pandas()
    docs = _pq("documents")
    docs["prio"] = [md5_lower64(str(int(i))) & ((1 << 63) - 1)
                    for i in docs.doc_id]
    want = (docs.sort_values(["lang", "prio", "doc_id"])
                .groupby("lang").head(q.PS_K)[["lang", "doc_id", "prio"]])
    key = ["lang", "prio"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False)
    assert (got.groupby("lang").size() <= q.PS_K).all()


def test_tpch_q21_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q21(SF).to_pandas().set_index("l_suppkey")
    li, orders = _pq("lineitem"), _pq("orders")
    fo = set(orders[orders.o_orderstatus == "F"].o_orderkey)
    li = li[li.l_orderkey.isin(fo)]
    blame = Counter()
    for ok, g in li.groupby("l_orderkey"):
        supps = set(g.l_suppkey)
        rsupps = set(g[g.l_returnflag == "R"].l_suppkey)
        if len(supps) >= 2 and len(rsupps) == 1:
            blame[next(iter(rsupps))] += 1
    assert dict(zip(got.index, got.numwait)) == dict(blame)


def test_double_sweep_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_double_sweep(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    n = ctx.n
    adj = [[] for _ in range(n)]
    for s, d in zip(e.src, e.dst):
        adj[s].append(d)
        adj[d].append(s)

    def bfs(root, iters):
        d = np.full(n, -1)
        d[root] = 0
        cur = [root]
        for lvl in range(1, iters + 1):
            nxt = []
            for u in cur:
                for v in adj[u]:
                    if d[v] < 0:
                        d[v] = lvl
                        nxt.append(v)
            cur = nxt
        return d

    labels = np.asarray(ctx.labels)
    root = int(np.searchsorted(labels, "m_0"))
    d1 = bfs(root, 12)
    reach = np.nonzero(d1 >= 0)[0]
    far = reach[d1[reach] == d1[reach].max()]
    r2 = int(far.min())
    d2 = bfs(r2, 12)
    assert got.label[0] == labels[r2]
    assert got.ecc[0] == d2[d2 >= 0].max()
    assert got.reached[0] == int((d2 >= 0).sum())


def test_token_pos_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_token_pos(SF).to_pandas().set_index("doc_id")
    docs = _pq("documents")
    want = {}
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        if q.POS_TOKEN in toks:
            want[did] = toks.index(q.POS_TOKEN) + 1
    assert dict(zip(got.index, got.pos)) == want
