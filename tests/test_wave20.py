"""Brute twins for wave 20: bipartiteness, percolation CC, Kronecker
product, max drawdown, decayed counters."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _und_adj(ctx):
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    adj = [[] for _ in range(ctx.n)]
    for s, d in zip(e.src, e.dst):
        if s != d:
            adj[s].append(d)
            adj[d].append(s)
    return adj


def test_bipartite_check_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_bipartite_check(SF).to_pandas()
    ctx = get_context(SF)
    adj = _und_adj(ctx)
    labels = np.asarray(ctx.labels)
    root = int(np.searchsorted(labels, "m_0"))
    d = np.full(ctx.n, -1)
    d[root] = 0
    cur = [root]
    for lvl in range(1, 13):
        nxt = []
        for u in cur:
            for v in adj[u]:
                if d[v] < 0:
                    d[v] = lvl
                    nxt.append(v)
        cur = nxt
    e = ctx.edges.to_pandas()
    seen = set()
    odd = 0
    for s, t in zip(e.src, e.dst):
        if s == t or d[s] < 0 or d[t] < 0:
            continue
        k = (min(s, t), max(s, t))
        if k in seen:
            continue
        seen.add(k)
        if d[s] % 2 == d[t] % 2:
            odd += 1
    assert got.reached[0] == int((d >= 0).sum())
    assert got.odd_edges[0] == odd
    assert got.is_bipartite[0] == int(odd == 0)


def test_percolation_cc_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_percolation_cc(SF).to_pandas()
    ctx = get_context(SF)
    n = ctx.n
    e = ctx.edges.to_pandas()
    kept = set()
    for s, t in zip(e.src, e.dst):
        if s == t:
            continue
        key = s * n + t
        h = ((key % (1 << 20)) * 2654435761 + key // (1 << 20)) % (1 << 32)
        if h % 100 < q.PERC_P:
            kept.add((s, t))
    assert got.kept_edges[0] == len(kept)
    # union-find gives the converged partition; 12 synchronous rounds
    # converge on this graph (the query also early-stops on a fixed
    # point), so counts agree
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in kept:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[rs] = rt
    roots = {find(x) for x in range(n)}
    assert got.n_components[0] == len(roots)


def test_kron_product_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_kron_product(SF).to_pandas().sort_values(
        ["ksrc", "kdst"]).reset_index(drop=True)
    ctx = get_context(SF)
    e = ctx.edges.to_pandas().groupby(["src", "dst"], as_index=False).w.sum()
    rows = []
    for s, t, w in zip(e.src, e.dst, e.w):
        for p, qq, wb in q.KRON_B:
            rows.append((s * 5 + p, t * 5 + qq, int(w) * wb))
    want = pd.DataFrame(rows, columns=["ksrc", "kdst", "w"]).sort_values(
        ["ksrc", "kdst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_max_drawdown_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_max_drawdown(SF).to_pandas().set_index("user_id")
    ev = _pq("events")
    ev["cents"] = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        cum = g.cents.cumsum().to_numpy()
        peak = np.maximum.accumulate(cum)
        assert got.loc[uid, "max_drawdown"] == (peak - cum).max()


def test_decayed_counts_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_decayed_counts(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    ref = np.datetime64(q.DECAY_REF, "us").astype(np.int64)
    ts = ev.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
    age = np.clip((ref - ts) // q.DECAY_US, 0, 62)
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    dec = cents >> age
    df = pd.DataFrame({"t": ev.event_type, "d": dec, "c": cents})
    for et, g in df.groupby("t"):
        assert got.loc[et, "decayed"] == g.d.sum()
        assert got.loc[et, "raw"] == g.c.sum()
