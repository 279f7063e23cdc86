"""Brute twins for wave 54: hub APSP, successor variety, year-end
ledger, nation x priority grid, per-dim quartiles."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_apsp_top_vs_brute_bfs(ray_session):
    from collections import deque

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_apsp_top(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    deg = np.zeros(ctx.n, dtype=np.int64)
    for v, ns in nbrs.items():
        deg[v] = len(ns)
    S = np.sort(np.lexsort((ar, -deg))[:q.APSP_K])
    sset = set(S.tolist())
    lab = {int(i): l for i, l in zip(S, ctx.gather_labels(S))}
    want = {}
    for r in S.tolist():
        dist = {r: 0}
        dq = deque([r])
        while dq:
            u = dq.popleft()
            if dist[u] >= q.BFS_ITERS:
                continue
            for v in nbrs.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, dd in dist.items():
            if v in sset and v != r:
                want[(lab[r], lab[v])] = dd
    got_d = {(a, b): d for a, b, d in
             zip(got.a_label, got.b_label, got.dist)}
    assert got_d == want


def test_succ_variety_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_succ_variety(SF).to_pandas()
    succ: dict[str, set] = {}
    for text in _pq("documents").text:
        t = text.split(" ")
        for a, b in zip(t[:-1], t[1:]):
            succ.setdefault(a, set()).add(b)
    items = sorted(((len(v), k) for k, v in succ.items()),
                   key=lambda x: (-x[0], x[1]))[:q.SUCC_K]
    assert list(zip(got.tok, got.variety)) == [(k, n) for n, k in items]


def test_yearend_ledger_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_yearend_ledger(SF).to_pandas()
    o = _pq("orders")
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    o["yr"] = o.o_orderdate.dt.year
    custs = sorted(o.o_custkey.unique())
    assert len(got) == len(custs) * (q.LEDGER_Y1 - q.LEDGER_Y0 + 1)
    g = got.set_index(["o_custkey", "yr"])
    rng = np.random.default_rng(3)
    for ck in rng.choice(custs, size=20, replace=False):
        sub = o[o.o_custkey == ck]
        for y in (q.LEDGER_Y0, 1995, q.LEDGER_Y1):
            m = sub[sub.yr <= y]
            row = g.loc[(ck, y)]
            assert row.cum_orders == len(m)
            assert row.cum_cents == m.cents.sum()


def test_nation_priority_grid_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_nation_priority_grid(SF).to_pandas()
    o = _pq("orders")[["o_custkey", "o_orderpriority"]]
    c = _pq("customer")[["c_custkey", "c_nationkey"]]
    n = _pq("nation")[["n_nationkey", "n_name"]]
    j = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
          .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    want = j.groupby(["n_name", "o_orderpriority"]).size().to_dict()
    got_d = {(a, b): n_ for a, b, n_ in
             zip(got.n_name, got.o_orderpriority, got.n_orders)}
    assert got_d == want


def test_emb_dim_quartiles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_emb_dim_quartiles(SF).to_pandas().set_index("dim")
    emb = _pq("embeddings")
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    for d in (0, 1, 31, 63):
        v = np.sort(M[:, d])
        n = len(v)
        for name, qq in zip(("q25", "q50", "q75"), q.EMB_QUARTS):
            idx = min(n - 1, int(np.ceil(qq * n)) - 1)
            assert got.loc[d][name] == v[idx]
