"""Brute-force twins for the wave-5 operators: HyperLogLog registers,
integer tf-idf top-k, LAG event gaps, ROLLUP counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from combblas_ray.functions import text as T


def _docs_ds(texts):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(list(texts), type=pa.string()),
        })
    ).repartition(3)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "jump the gun and jump the shark",
    "",  # empty text -> one '' token (string-split semantics)
    "dozen dozen dozen quick quick the",
]


def test_hll_registers_match_brute(ray_session):
    regs = T.hll_registers(_docs_ds(TEXTS)).to_pandas()
    # brute: every distinct token across the corpus, hashed the same way
    toks = sorted({t for s in TEXTS for t in s.split(" ")})
    tab = {}
    for t in toks:
        h = T.md5_lower64(t)
        b = h & (T.HLL_M - 1)
        rest = (h >> T.HLL_P) & ((1 << T._HLL_RESTBITS) - 1)
        if rest > 0:
            rho = 1 + (rest & -rest).bit_length() - 1
        else:
            rho = T._HLL_RESTBITS + 1
        tab[b] = max(tab.get(b, 0), rho)
    got = dict(zip(regs["b"], regs["r"]))
    assert got == tab


def test_hll_estimate_sane(ray_session):
    texts = [" ".join(f"tok{i * 97 + j}" for j in range(50))
             for i in range(200)]
    parts = [t for t in ray.get(
        T.hll_registers(_docs_ds(texts)).to_arrow_refs()) if t.num_rows]
    est = T.hll_estimate(pa.concat_tables(parts))
    true = len({t for s in texts for t in s.split(" ")})
    assert abs(est - true) / true < 0.2  # p=8 -> ~6.5% typical error


def test_tfidf_topk_matches_brute(ray_session):
    k = 2
    out = (T.tfidf_topk(_docs_ds(TEXTS), k=k).to_pandas()
           .sort_values(["doc_id", "tok"]).reset_index(drop=True))
    rows = []
    n = len(TEXTS)
    df_ctr = {}
    tf_ctr = []
    for d, s in enumerate(TEXTS):
        cnt = {}
        for t in s.split(" "):
            cnt[t] = cnt.get(t, 0) + 1
        tf_ctr.append(cnt)
        for t in cnt:
            df_ctr[t] = df_ctr.get(t, 0) + 1
    for d, cnt in enumerate(tf_ctr):
        scored = sorted(
            ((tf * ((n * T.TFIDF_SCALE) // df_ctr[t]), t, tf) for t, tf
             in cnt.items()),
            key=lambda x: (-x[0], x[1]))[:k]
        for score, t, tf in scored:
            rows.append((d, t, tf, df_ctr[t], score))
    exp = (pd.DataFrame(rows, columns=["doc_id", "tok", "tf", "df",
                                       "score"])
           .sort_values(["doc_id", "tok"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["doc_id", "tok", "tf", "df", "score"]].astype(
            {"doc_id": np.int64, "tf": np.int64, "df": np.int64,
             "score": np.int64}),
        exp.astype({"doc_id": np.int64, "tf": np.int64, "df": np.int64,
                    "score": np.int64}),
    )


def _events_ds(n=200, users=7, seed=3):
    rng = np.random.RandomState(seed)
    ts = (np.int64(1_700_000_000_000_000)
          + rng.randint(0, 10**9, size=n).astype(np.int64))
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.randint(0, users, size=n)
                            .astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click", "buy"])[rng.randint(0, 3, n)],
            type=pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 300, n), 2)),
    })).repartition(4)


def test_event_gaps_matches_pandas(ray_session, tmp_path):
    ds = _events_ds()
    pdf = ds.to_pandas()
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), path)
    from combblas_ray.pipelines import queries as q

    out = (q.q_event_gaps(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    pdf["ts_us"] = pdf["ts"].astype("int64")
    pdf = pdf.sort_values(["user_id", "ts_us", "event_id"])
    pdf["prev_event_id"] = pdf.groupby("user_id")["event_id"].shift(1)
    pdf["gap_us"] = pdf["ts_us"] - pdf.groupby("user_id")["ts_us"].shift(1)
    exp = (pdf.dropna(subset=["prev_event_id"])
           [["event_id", "prev_event_id", "gap_us"]]
           .astype(np.int64).sort_values("event_id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype(np.int64), exp)


def test_rollup_counts_matches_pandas(ray_session, tmp_path):
    ds = _events_ds(n=300, users=5, seed=9)
    pdf = ds.to_pandas()
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), path)
    from combblas_ray.pipelines import queries as q

    out = (q.q_rollup_counts(str(tmp_path)).to_pandas()
           .sort_values(["event_type", "hr"]).reset_index(drop=True))
    pdf["hr"] = (pdf["ts"].astype("int64") // 3_600_000_000) % 24
    pdf["cents"] = np.floor(pdf["value"] * 100 + 0.5).astype(np.int64)
    fine = (pdf.groupby(["event_type", "hr"])
            .agg(cnt=("cents", "size"), cents=("cents", "sum"))
            .reset_index())
    lvl1 = (pdf.groupby("event_type")
            .agg(cnt=("cents", "size"), cents=("cents", "sum"))
            .reset_index())
    lvl1["hr"] = -1
    total = pd.DataFrame([{"event_type": "ALL", "hr": -1,
                           "cnt": len(pdf),
                           "cents": int(pdf["cents"].sum())}])
    exp = (pd.concat([fine, lvl1, total], ignore_index=True)
           [["event_type", "hr", "cnt", "cents"]]
           .sort_values(["event_type", "hr"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"hr": np.int64, "cnt": np.int64, "cents": np.int64}),
        exp.astype({"hr": np.int64, "cnt": np.int64, "cents": np.int64}),
    )


# --------------------------------------------------------------------------
# scc_fixed / random_walks
# --------------------------------------------------------------------------


def _minlabel_rounds(M, iters):
    """Brute: x'[v] = min(x[v], min over {u: M[v, u]} x[u])."""
    n = M.shape[0]
    x = np.arange(n, dtype=np.int64)
    mask = M.astype(bool)
    for _ in range(iters):
        cand = np.where(mask, x[None, :], np.iinfo(np.int64).max)
        x = np.minimum(x, cand.min(axis=1))
    return x


def test_scc_coloring_vs_brute(ctx500):
    from tests.conftest import brute_dense_matrix

    from combblas_ray.pipelines import algorithms as alg

    A = brute_dense_matrix(ctx500)  # A[dst, src]
    M = (A > 0).astype(np.int64)
    np.fill_diagonal(M, 0)
    iters = 4
    bwd = _minlabel_rounds(M, iters)      # min label reaching v
    fwd = _minlabel_rounds(M.T, iters)    # min label v reaches
    exp = np.where(fwd == bwd, fwd, np.arange(ctx500.n, dtype=np.int64))
    got = alg.scc_coloring(ctx500.engine("dir_bool"),
                           ctx500.engine("rev_bool"), iters)
    assert np.array_equal(got, exp)


def _tarjan(n, src, dst):
    """Iterative Tarjan; scc id = min member id (canonical labeling)."""
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
    index = [-1] * n
    low = [0] * n
    onstk = [False] * n
    stk = []
    out = [-1] * n
    counter = [0]
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stk.append(v)
                onstk[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if onstk[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return np.asarray(out, dtype=np.int64)


def test_scc_full_vs_tarjan(ctx500):
    from combblas_ray.pipelines import algorithms as alg

    rows = ctx500.edges.take_all()
    src = [int(r["src"]) for r in rows if r["src"] != r["dst"]]
    dst = [int(r["dst"]) for r in rows if r["src"] != r["dst"]]
    exp = _tarjan(ctx500.n, src, dst)
    got = alg.scc(ctx500.engine("dir_bool"), ctx500.engine("rev_bool"))
    assert np.array_equal(got, exp)


def test_scc_two_cycles(ray_session, tmp_path):
    """Crafted graph: two directed 3-cycles joined by a one-way bridge
    -> exactly two SCCs (the bridge must NOT merge them; one coloring
    round alone cannot see the second cycle — the full decomposition
    must)."""
    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines import algorithms as alg

    src = np.array([0, 1, 2, 3, 4, 5, 2], dtype=np.int64)
    dst = np.array([1, 2, 0, 4, 5, 3, 3], dtype=np.int64)

    def _eng(s, d, sub):
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array(s), "dst": pa.array(d),
            "w": pa.array(np.ones(len(s), dtype=np.float64)),
        }))
        return SpmvEngine.from_graph(Graph(n=6, edges=ds), 1,
                                     str(tmp_path / sub), resume=False)

    eng_f = _eng(src, dst, "f")
    eng_r = _eng(dst, src, "r")
    part = alg.scc_coloring(eng_f, eng_r, 4)
    assert part.tolist() == [0, 0, 0, 3, 4, 5]  # partial: region-min SCC
    full = alg.scc(eng_f, eng_r)
    assert full.tolist() == [0, 0, 0, 3, 3, 3]
    eng_f.shutdown()
    eng_r.shutdown()


def test_random_walks_vs_brute(ctx500):
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines.algorithms import (_RW_A, _RW_C, _RW_MOD,
                                                   _RW_T, _RW_W)

    rows = ctx500.edges.take_all()
    adj = {}
    for r in rows:
        adj.setdefault(int(r["src"]), set()).add(int(r["dst"]))
    adj = {s: sorted(d) for s, d in adj.items()}
    seeds = np.arange(5, dtype=np.int64)
    steps = 4
    exp = []
    for w, s in enumerate(seeds):
        cur = int(s)
        exp.append((w, 0, cur))
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            lcg = ((w * _RW_W + t * _RW_T) * _RW_A + _RW_C) % _RW_MOD
            cur = nbrs[lcg % len(nbrs)]
            exp.append((w, t, cur))
    got = alg.random_walks(ctx500.edges, seeds, steps, num_partitions=4)
    got_rows = sorted(zip(
        np.asarray(got.column("walker")).tolist(),
        np.asarray(got.column("step")).tolist(),
        np.asarray(got.column("vertex")).tolist(),
    ))
    assert got_rows == sorted(exp)


def test_pivot_user_type_matches_pandas(ray_session, tmp_path):
    ds = _events_ds(n=250, users=9, seed=21)
    pdf = ds.to_pandas()
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "events.parquet"))
    from combblas_ray.pipelines import queries as q

    out = (q.q_pivot_user_type(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    piv = (pdf.pivot_table(index="user_id", columns="event_type",
                           values="ts", aggfunc="count", fill_value=0)
           .reset_index())
    for ty in q.PIVOT_TYPES:
        exp = (piv[ty].to_numpy(dtype=np.int64)
               if ty in piv.columns else np.zeros(len(piv), dtype=np.int64))
        assert np.array_equal(out[f"n_{ty}"].to_numpy(dtype=np.int64), exp)
    assert np.array_equal(out["user_id"].to_numpy(),
                          piv["user_id"].to_numpy())


def test_oov_rate_matches_brute(ray_session, tmp_path):
    texts = TEXTS * 3  # repeats push some tokens into the vocab cut
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from collections import Counter

    from combblas_ray.pipelines import queries as q

    out = (q.q_oov_rate(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    c = Counter(t for s in texts for t in s.split(" "))
    vocab = {t for t, _ in sorted(c.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:q.OOV_VOCAB_K]}
    for d, s in enumerate(texts):
        toks = s.split(" ")
        assert out.loc[d, "n_tokens"] == len(toks)
        assert out.loc[d, "n_oov"] == sum(t not in vocab for t in toks)


def test_pagerank_incremental_matches_cold(ctx500, tmp_path):
    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.pipelines.pagerank import (pagerank,
                                                 pagerank_incremental)

    eng = ctx500.engine("directed")
    r_prev, info_prev = pagerank(eng, tol=1e-12, max_iters=200)
    pruned = ctx500.graph("directed").prune(
        lambda s, d, w: (s * 31 + d) % 101 == 0)
    eng2 = SpmvEngine.from_graph(pruned, 2, str(tmp_path / "princ"),
                                 resume=False)
    cold, info_cold = pagerank(eng2, tol=1e-12, max_iters=200)
    warm, info_warm = pagerank_incremental(eng2, r_prev, tol=1e-12,
                                           max_iters=200)
    assert np.allclose(warm, cold, atol=1e-9)
    assert info_warm["iters"] <= info_cold["iters"]
    eng2.shutdown()
