"""Brute-force twins for the wave-10 operators: Boruvka MSF, repetition
stats, source stats, collocation lift, big spenders, closeness."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _kruskal(edges, n):
    """Unique-MSF Kruskal under the (w, u, v) total order; returns the
    edge set and a union-find root array."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for w, u, v in sorted(edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            chosen.append((u, v, w))
    return set(chosen), [find(x) for x in range(n)]


def test_boruvka_msf_vs_kruskal(ray_session):
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    # undirected edge list with u < v, deduped
    uv = {}
    for s, d, w in zip(e.src, e.dst, e.w):
        u, v = int(min(s, d)), int(max(s, d))
        uv[(u, v)] = float(w)
    want, roots = _kruskal([(w, u, v) for (u, v), w in uv.items()], ctx.n)
    msf, comp = alg.boruvka_msf(ctx.graph("sym").dedup_sum().edges, ctx.n)
    got = set(zip(msf.column("u").to_pylist(), msf.column("v").to_pylist(),
                  msf.column("w").to_pylist()))
    assert got == want
    # components agree with union-find components
    ra = np.asarray(roots)
    a = np.unique(np.stack([comp, ra]), axis=1)
    assert len(np.unique(a[0])) == len(a[0])  # bijection comp <-> root
    assert len(np.unique(a[1])) == len(a[1])


def test_boruvka_msf_crafted_two_triangles(ray_session):
    import ray

    from combblas_ray.pipelines import algorithms as alg

    # two triangles joined by a heavy bridge; MSF drops each triangle's
    # heaviest edge but keeps the bridge
    und = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0),
           (3, 4, 1.0), (4, 5, 2.0), (3, 5, 3.0), (2, 3, 10.0)]
    rows = []
    for u, v, w in und:
        rows.append({"src": u, "dst": v, "w": w})
        rows.append({"src": v, "dst": u, "w": w})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    msf, comp = alg.boruvka_msf(ds, 6)
    got = set(zip(msf.column("u").to_pylist(), msf.column("v").to_pylist(),
                  msf.column("w").to_pylist()))
    assert got == {(0, 1, 1.0), (1, 2, 2.0), (3, 4, 1.0), (4, 5, 2.0),
                   (2, 3, 10.0)}
    assert len(set(comp)) == 1


def test_rep_ngrams_vs_brute(ray_session):
    from combblas_ray.functions.text import rep_ngram_stats

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b a b a b", "x y z", "q q q q"],
                         type=pa.string()),
    })
    out = rep_ngram_stats(docs, 3).to_pandas()
    # doc0: 4 trigrams (aba, bab, aba, bab) -> distinct 2, dup 2; max tok 3
    # doc1: 1 trigram distinct; max tok 1
    # doc2: 2 trigrams (qqq x2) -> distinct 1 dup 1; max tok 4
    assert list(out.total_w) == [4, 1, 2]
    assert list(out.distinct_w) == [2, 1, 1]
    assert list(out.dup_w) == [2, 0, 1]
    assert list(out.maxtok) == [3, 1, 4]


def test_source_stats_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_source_stats

    out = q_source_stats(SF).to_pandas().sort_values("source") \
        .reset_index(drop=True)
    d = pd.read_parquet(f"{SF}/documents.parquet")
    g = d.groupby("source").agg(
        n_docs=("doc_id", "size"), n_langs=("lang", "nunique"),
        chars=("n_chars", "sum"), n_distinct=("text", "nunique"),
    ).reset_index().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["source", "n_docs", "n_langs", "chars", "n_distinct"]],
        g, check_dtype=False)


def test_colloc_lift_vs_counter_brute(ray_session):
    from collections import Counter

    from combblas_ray.functions.text import COLLOC_SCALE
    from combblas_ray.pipelines.queries import (COLLOC_MIN, COLLOC_TOPK,
                                                q_colloc_lift)

    out = q_colloc_lift(SF).to_pandas()
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    uni, bi = Counter(), Counter()
    for t in d.text:
        toks = t.split(" ")
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    cands = [(cab * COLLOC_SCALE // (uni[a] * uni[b]), a, b, cab)
             for (a, b), cab in bi.items() if cab >= COLLOC_MIN]
    want = sorted(cands, key=lambda t: (-t[0], t[1], t[2]))[:COLLOC_TOPK]
    got = list(zip(out.score, out.a, out.b, out.cab))
    assert [(int(s), a, b, int(c)) for s, a, b, c in got] == want


def test_big_spenders_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_big_spenders

    out = q_big_spenders(SF).to_pandas().sort_values("c_custkey") \
        .reset_index(drop=True)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["cents"] = np.floor(od.o_totalprice.to_numpy() * 100.0
                           + 0.5).astype(np.int64)
    spend = od.groupby("o_custkey").cents.sum().rename("spend_cents")
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    j = cust.join(spend, on="c_custkey", how="inner")
    seg = j.groupby("c_mktsegment").spend_cents.agg(["sum", "count"])
    j = j.join(seg, on="c_mktsegment")
    want = j[j.spend_cents * j["count"] > 2 * j["sum"]] \
        .sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["c_custkey", "c_mktsegment", "spend_cents"]],
        want[["c_custkey", "c_mktsegment", "spend_cents"]],
        check_dtype=False)


def test_closeness_matches_ecc_reach(ray_session):
    """closeness_sample and ecc_sample run the same BFS: reach counts
    must agree and sum_d must be consistent with ecc bounds."""
    from combblas_ray.pipelines.queries import (q_closeness_sample,
                                                q_ecc_sample)

    c = q_closeness_sample(SF).to_pandas().set_index("seed")
    e = q_ecc_sample(SF).to_pandas().set_index("seed")
    assert (c.n_reached == e.n_reached).all()
    # 0 <= sum_d <= ecc * (reached - 1)
    assert (c.sum_d <= e.ecc * (c.n_reached - 1)).all()
    assert (c.sum_d >= c.n_reached - 1).all()


def test_hyperanf_vs_ball_brute(ray_session):
    """HyperANF registers after K rounds must equal the HLL registers of
    each vertex's exact <=K-hop ball (max-merge is exact, not an
    estimate, for the register table itself)."""
    from combblas_ray.functions.text import _popcount64, md5_lower64
    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.queries import (ANF_M, ANF_P, ANF_ROUNDS,
                                                q_hyperanf)

    ctx = get_context(SF)
    n = ctx.n
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    nbrs = [[] for _ in range(n)]
    for s, d in zip(e.src.to_numpy(), e.dst.to_numpy()):
        nbrs[int(s)].append(int(d))
    labels = np.asarray(ctx.labels)
    hu = np.fromiter((md5_lower64(x) for x in labels), dtype=np.uint64,
                     count=n)
    b = (hu & np.uint64(ANF_M - 1)).astype(np.int64)
    rest = ((hu >> np.uint64(ANF_P))
            & np.uint64((1 << 52) - 1)).astype(np.int64)
    lsb = (rest & -rest).astype(np.uint64)
    rho = np.where(rest > 0, _popcount64(lsb - np.uint64(1)) + 1, 53)
    # exact K-hop balls by BFS (n=6000: fine)
    import collections
    packed_want = np.zeros(n, dtype=np.int64)
    for v in range(n):
        seen = {v}
        frontier = [v]
        for _ in range(ANF_ROUNDS):
            nxt = [u for f in frontier for u in nbrs[f] if u not in seen]
            seen.update(nxt)
            frontier = nxt
            if not frontier:
                break
        regs = np.zeros(ANF_M, dtype=np.int64)
        ball = np.fromiter(seen, dtype=np.int64, count=len(seen))
        np.maximum.at(regs, b[ball], rho[ball])
        packed_want[v] = int((regs << (6 * np.arange(ANF_M))).sum())
    out = q_hyperanf(SF).to_pandas()
    got = np.empty(n, dtype=np.int64)
    got[np.searchsorted(labels, out.label.to_numpy())] = \
        out.packed.to_numpy()
    assert np.array_equal(got, packed_want)


def test_tpch_q10_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import (TPCH_Q10_HI, TPCH_Q10_LO,
                                                TPCH_Q10_TOPK, q_tpch_q10)

    out = q_tpch_q10(SF).to_pandas()
    import datetime
    lo, hi = datetime.datetime(*TPCH_Q10_LO), datetime.datetime(*TPCH_Q10_HI)
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[(o.o_orderdate >= lo) & (o.o_orderdate < hi)]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li.l_returnflag == "R"].copy()
    li["cents"] = np.floor(li.l_extendedprice.to_numpy()
                           * (1.0 - li.l_discount.to_numpy())
                           * 100.0).astype(np.int64)
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    rev = j.groupby("o_custkey").cents.sum().rename("rev_cents")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    w = c.join(rev, on="c_custkey", how="inner") \
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    w = w.sort_values(["rev_cents", "c_custkey"],
                      ascending=[False, True]).head(TPCH_Q10_TOPK)
    assert list(out.c_custkey) == list(w.c_custkey)
    assert list(out.rev_cents) == list(w.rev_cents)
    assert list(out.n_name) == list(w.n_name)


def test_triangles_list_consistency_and_brute(ray_session):
    from itertools import combinations

    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.queries import q_triangles_list

    out = q_triangles_list(SF).to_pandas()
    # every row is an actual triangle with a < b < c in label order
    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    labels = np.asarray(ctx.labels)
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src.to_numpy(), e.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    want = set()
    for z, ns in nbrs.items():
        for a, b in combinations(sorted(ns), 2):
            if b in nbrs[a] and z < a:  # each triangle once: z < a < b
                want.add((labels[z], labels[a], labels[b]))
    got = set(zip(out.a, out.b, out.c))
    assert got == want


def test_edge_jaccard_vs_set_brute(ray_session):
    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.queries import EDGEJ_SCALE, q_edge_jaccard

    out = q_edge_jaccard(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    labels = np.asarray(ctx.labels)
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src.to_numpy(), e.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    want = {}
    for a, ns in nbrs.items():
        for b in ns:
            if a < b:
                cn = len(nbrs[a] & nbrs[b])
                want[(labels[a], labels[b])] = (
                    cn, cn * EDGEJ_SCALE // (len(nbrs[a]) + len(nbrs[b])
                                             - cn))
    got = {(r.a, r.b): (r.cn, r.score) for r in out.itertuples()}
    assert got == want


def test_tpch_q18_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import TPCH_Q18_QTY, q_tpch_q18

    out = q_tpch_q18(SF).to_pandas().sort_values("o_orderkey") \
        .reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    li["q"] = np.floor(li.l_quantity.to_numpy() + 0.5).astype(np.int64)
    s = li.groupby("l_orderkey").q.sum()
    s = s[s > TPCH_Q18_QTY].rename("sum_qty")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    w = o.join(s, on="o_orderkey", how="inner") \
        .sort_values("o_orderkey").reset_index(drop=True)
    assert list(out.o_orderkey) == list(w.o_orderkey)
    assert list(out.o_custkey) == list(w.o_custkey)
    assert list(out.sum_qty) == list(w.sum_qty)
    assert list(out.price_cents) == list(
        np.floor(w.o_totalprice.to_numpy() * 100.0 + 0.5).astype(np.int64))


def test_tpch_q14_vs_pandas_brute(ray_session):
    import datetime

    from combblas_ray.pipelines.queries import (TPCH_Q14_HI, TPCH_Q14_LO,
                                                q_tpch_q14)

    out = q_tpch_q14(SF).to_pandas()
    lo, hi = datetime.datetime(*TPCH_Q14_LO), datetime.datetime(*TPCH_Q14_HI)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)].copy()
    li["cents"] = np.floor(li.l_extendedprice.to_numpy()
                           * (1.0 - li.l_discount.to_numpy())
                           * 100.0).astype(np.int64)
    p = pd.read_parquet(f"{SF}/part.parquet",
                        columns=["p_partkey", "p_type"])
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    assert int(out.total_cents[0]) == int(j.cents.sum())
    assert int(out.promo_cents[0]) == int(j.cents[j.p_type == "PROMO"].sum())
    assert int(out.nlines[0]) == len(j)


def test_window_pair_join_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import PAIRWIN_US, q_window_pair_join

    out = q_window_pair_join(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["us"] = ev.ts.astype("datetime64[us]").astype(np.int64)
    for uid, grp in ev.groupby("user_id"):
        ts = np.sort(grp.us.to_numpy())
        cnt = sum(int(np.searchsorted(ts, ts[i] + PAIRWIN_US, "right")
                      - i - 1) for i in range(len(ts)))
        assert int(out.loc[uid, "pairs_1h"]) == cnt


def test_skyline_parts_vs_brute(ray_session):
    from combblas_ray.pipelines.queries import q_skyline_parts

    out = q_skyline_parts(SF).to_pandas()
    p = pd.read_parquet(f"{SF}/part.parquet")
    sz = p.p_size.to_numpy().astype(np.int64)
    pc = np.floor(p.p_retailprice.to_numpy() * 100 + 0.5).astype(np.int64)
    dom = ((sz[:, None] >= sz[None, :]) & (pc[:, None] <= pc[None, :])
           & ((sz[:, None] > sz[None, :]) | (pc[:, None] < pc[None, :])))
    alive = ~dom.any(axis=0)
    want = set(p.p_partkey.to_numpy()[alive])
    assert set(out.p_partkey) == want


def test_retention_cohorts_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_retention_cohorts

    out = q_retention_cohorts(SF).to_pandas() \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["wk"] = (ev.ts.astype("datetime64[s]").astype(np.int64)
                // 86400) // 7
    uw = ev[["user_id", "wk"]].drop_duplicates()
    coh = uw.groupby("user_id").wk.min().rename("cw")
    j = uw.join(coh, on="user_id")
    g = j.groupby([j.cw, j.wk - j.cw]).size().reset_index()
    g.columns = ["cohort_week", "week_offset", "users"]
    g = g.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, g, check_dtype=False)


def test_rich_club_vs_brute(ray_session):
    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.queries import RICH_DEG, q_rich_club

    out = q_rich_club(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    pairs = {(min(int(s), int(d)), max(int(s), int(d)))
             for s, d in zip(e.src, e.dst) if s != d}
    deg = np.zeros(ctx.n, dtype=np.int64)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    rich = set(np.flatnonzero(deg > RICH_DEG))
    assert int(out["nv"][0]) == len(rich)
    assert int(out["ne"][0]) == sum(
        1 for a, b in pairs if a in rich and b in rich)


def test_tpch_q12_vs_pandas_brute(ray_session):
    import datetime

    from combblas_ray.pipelines.queries import TPCH_Q12_YEAR, q_tpch_q12

    out = q_tpch_q12(SF).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_shipdate"])
    lo = datetime.datetime(TPCH_Q12_YEAR, 1, 1)
    hi = datetime.datetime(TPCH_Q12_YEAR + 1, 1, 1)
    li = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)]
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["high"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    g = j.groupby("l_returnflag").high.agg(["sum", "count"])
    assert set(out.index) == set(g.index)
    for f in g.index:
        assert int(out.high_count[f]) == int(g["sum"][f])
        assert int(out.low_count[f]) == int(g["count"][f] - g["sum"][f])


def test_tpch_q13_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import TPCH_Q13_EXCL, q_tpch_q13

    out = q_tpch_q13(SF).to_pandas().set_index("c_count")
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    o = o[o.o_orderpriority != TPCH_Q13_EXCL]
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    cnt = o.groupby("o_custkey").size().reindex(
        c.c_custkey, fill_value=0)
    hist = cnt.value_counts()
    assert set(out.index) == set(hist.index)
    for k in hist.index:
        assert int(out.custdist[k]) == int(hist[k])


def test_rolling_sum4_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import ROLL_WIN, q_rolling_sum4

    out = q_rolling_sum4(SF).to_pandas().set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev["cents"] = np.floor(
        ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    roll = ev.groupby("user_id").cents.rolling(
        ROLL_WIN, min_periods=1).sum().reset_index(level=0, drop=True)
    assert len(out) == len(ev)
    for eid, want in zip(ev.event_id, roll):
        assert int(out.roll_cents[eid]) == int(want)


def test_reciprocity_vs_brute(ray_session):
    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.queries import q_reciprocity

    out = q_reciprocity(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    de = {(int(s), int(d)) for s, d in zip(e.src, e.dst) if s != d}
    recip = sum(1 for s, d in de if (d, s) in de)
    assert int(out["n_edges"][0]) == len(de)
    assert int(out["n_recip"][0]) == recip


def test_simhash_pairs_vs_brute(ray_session):
    from combblas_ray.functions.dedup import simhash
    from combblas_ray.pipelines.queries import SH_T, q_simhash_pairs
    import ray

    out = q_simhash_pairs(SF).to_pandas()
    got = {(int(a), int(b)): int(h)
           for a, b, h in zip(out.a, out.b, out.hamm)}
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    sh = simhash(docs).to_pandas()
    codes = dict(zip(sh.doc_id.astype(int),
                     sh.simhash.to_numpy().astype(np.int64)))
    want = {}
    ids = sorted(codes)
    arr = np.array([codes[i] for i in ids], dtype=np.int64).view(np.uint64)
    for i in range(len(ids)):
        x = arr[i] ^ arr[i + 1:]
        ham = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        for off in np.flatnonzero(ham <= SH_T):
            want[(ids[i], ids[i + 1 + off])] = int(ham[off])
    assert got == want


def test_range_search_vs_brute(ray_session):
    import pyarrow.parquet as pq

    from combblas_ray.pipelines.queries import (RS_MIN, RS_Q,
                                                q_range_search)

    out = q_range_search(SF).to_pandas()
    got = {(int(q), int(v)): int(d)
           for q, v, d in zip(out.qid, out.vec_id, out["dot"])}
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    E = np.vstack([np.asarray(x) for x in
                   t.column("embedding").to_pylist()]).astype(np.float64)
    Q = np.floor((E + 0.5) * (1 << 20)).astype(np.int64)
    order = np.argsort(ids)
    ids, Q = ids[order], Q[order]
    d = Q[:RS_Q] @ Q.T
    want = {}
    for qi in range(RS_Q):
        for j in np.flatnonzero(d[qi] >= RS_MIN):
            want[(int(ids[qi]), int(ids[j]))] = int(d[qi, j])
    assert got == want


def test_tpch_q16_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import (Q16_EXCL_BRAND, Q16_SIZES,
                                                q_tpch_q16)

    out = q_tpch_q16(SF).to_pandas().set_index(["p_brand", "p_size"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    p = pd.read_parquet(f"{SF}/part.parquet",
                        columns=["p_partkey", "p_brand", "p_size"])
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    bad = set(s[s.s_acctbal < 0].s_suppkey.astype(int))
    p = p[(p.p_brand != Q16_EXCL_BRAND) & p.p_size.isin(Q16_SIZES)]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j[~j.l_suppkey.isin(bad)]
    w = j.groupby(["p_brand", "p_size"]).l_suppkey.nunique()
    assert len(out) == len(w)
    for (b, sz), cnt in w.items():
        assert int(out.supplier_cnt[(b, int(sz))]) == int(cnt)


def test_mode_hour_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_mode_hour

    out = q_mode_hour(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    ev["hour"] = ev.ts.dt.hour
    c = ev.groupby(["event_type", "hour"]).size().reset_index(name="cnt")
    for et, grp in c.groupby("event_type"):
        top = grp.sort_values(["cnt", "hour"],
                              ascending=[False, True]).iloc[0]
        assert int(out.hour[et]) == int(top.hour)
        assert int(out.cnt[et]) == int(top.cnt)
