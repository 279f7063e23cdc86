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
