"""Brute twins for wave 50: edge support census, SymSpell edit-1
pairs, above-average orders, ship-lag quantiles, 1-NN margins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edge_support_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    sv, sc = alg.edge_support_hist(ctx.graph("sym").edges, ctx.n)
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    from collections import Counter

    cnt = Counter()
    for u, ns in nbrs.items():
        for v in ns:
            if u < v:
                cnt[len(ns & nbrs[v])] += 1
    assert dict(zip(sv.tolist(), sc.tolist())) == dict(cnt)
    # sanity: 3 * triangles == sum(support)/... each triangle credits 3
    tri = sum(s * c for s, c in cnt.items())
    assert tri % 3 == 0


def test_edit1_pairs_vs_brute_levenshtein(ray_session):
    """Synthetic vocabulary with the tricky cases: single-char words
    (empty-key bucket), multi-index deletions ('aa'->'a'), adjacent
    repeats, near-misses at distance 2."""
    import ray

    from combblas_ray.functions.dedup import edit1_pairs

    vocab = ["a", "b", "ab", "ba", "aa", "aab", "abb", "abc", "adc",
             "bc", "abcd", "acd", "xyz", "xz", "yz", "wxyz", "hello",
             "hallo", "hell", "help", "kitten", "sitten", "sittin",
             "", "q"]
    ds = ray.data.from_arrow(
        pa.table({"tok": pa.array(sorted(set(vocab)))}))
    got = edit1_pairs(ds).to_pandas()
    got_pairs = set(zip(got.wa, got.wb))
    uniq = sorted(set(vocab))
    want = {(a, b) for i, a in enumerate(uniq) for b in uniq[i + 1:]
            if _lev(a, b) == 1}
    assert got_pairs == want


def test_above_avg_orders_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_above_avg_orders(SF).to_pandas().set_index("o_custkey")
    o = _pq("orders")
    o["c"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    for ck, g in o.groupby("o_custkey"):
        n = len(g)
        above = int((g.c * n > g.c.sum()).sum())
        assert got.loc[ck].n_orders == n
        assert got.loc[ck].n_above == above


def test_ship_lag_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_ship_lag_stats(SF).to_pandas().set_index("prio")
    li = _pq("lineitem")[["l_orderkey", "l_shipdate"]]
    o = _pq("orders")[["o_orderkey", "o_orderdate", "o_orderpriority"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    lag = ((j.l_shipdate.astype("datetime64[us]").astype("int64")
            - j.o_orderdate.astype("datetime64[us]").astype("int64"))
           // 86_400_000_000)
    for prio, g in lag.groupby(j.o_orderpriority):
        v = np.sort(g.to_numpy())
        n = len(v)
        row = got.loc[prio]
        assert row.n == n
        assert row.lag_q50 == v[min(n - 1, int(np.ceil(0.5 * n)) - 1)]
        assert row.lag_q90 == v[min(n - 1, int(np.ceil(0.9 * n)) - 1)]
        assert row.lag_min == v[0] and row.lag_max == v[-1]


def test_knn_margin_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_knn_margin(SF).to_pandas().set_index("label")
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.KNN1_N].sort_values("vec_id")
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    lab = emb.label.to_numpy().astype(np.int64)
    d = M @ M.T
    np.fill_diagonal(d, np.iinfo(np.int64).min)
    agg: dict[int, list[int]] = {}
    for i in range(len(lab)):
        same = lab == lab[i]
        same[i] = False
        other = lab != lab[i]
        if not same.any() or not other.any():
            continue
        bs = d[i][same].max()
        bo = d[i][other].max()
        e = agg.setdefault(int(lab[i]), [0, 0, 0])
        e[0] += 1
        e[1] += int(bs > bo)
        e[2] += int(bs - bo)
    for k, (n, npos, sm) in agg.items():
        row = got.loc[k]
        assert (row.n, row.n_pos, row.sum_margin) == (n, npos, sm)
