"""Brute twins for wave 17: TPC-H Q9/Q19, Levenshtein kernel + window
pairs, language Gini, audio integer features."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _lev_ref(a: str, b: str) -> int:
    """Classic O(mn) reference DP, byte-level."""
    x, y = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(y) + 1))
    for i in range(1, len(x) + 1):
        cur = [i]
        for j in range(1, len(y) + 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x[i - 1] != y[j - 1])))
        prev = cur
    return prev[len(y)]


def test_levenshtein_batch_vs_reference():
    from combblas_ray.functions.text import levenshtein_batch

    rng = np.random.default_rng(11)
    alpha = "abcdé中 "
    pairs = []
    for _ in range(200):
        n1, n2 = rng.integers(0, 15, 2)
        pairs.append(("".join(rng.choice(list(alpha), n1)),
                      "".join(rng.choice(list(alpha), n2))))
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = [_lev_ref(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_edit_window_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_edit_window(SF).to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)
    docs = _pq("documents")
    txt = dict(zip(docs.doc_id, docs.text))
    rows = []
    for a in sorted(txt):
        for d in range(1, q.ED_W + 1):
            if a + d in txt:
                rows.append((a, a + d,
                             _lev_ref(txt[a][:q.ED_K], txt[a + d][:q.ED_K])))
    want = pd.DataFrame(rows, columns=["a", "b", "dist"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tpch_q9_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q9(SF).to_pandas()
    li, part, sup, nat = (_pq("lineitem"), _pq("part"), _pq("supplier"),
                          _pq("nation"))
    j = (li.merge(part[part.p_name.str.contains(q.Q9_PART)],
                  left_on="l_partkey", right_on="p_partkey")
           .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
           .merge(nat, left_on="s_nationkey", right_on="n_nationkey"))
    j["profit_cents"] = np.floor(
        j.l_extendedprice.to_numpy()
        * (1.0 - j.l_discount.to_numpy()) * 100.0).astype(np.int64)
    j["l_year"] = j.l_shipdate.dt.year.astype(np.int64)
    want = (j.groupby(["n_name", "l_year"], as_index=False)
             .profit_cents.sum().rename(columns={"n_name": "nation"}))
    cols = ["nation", "l_year"]
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tpch_q19_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q19(SF).to_pandas()
    li, part = _pq("lineitem"), _pq("part")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    keep = np.zeros(len(j), dtype=bool)
    for b, slo, shi, qlo, qhi in q.Q19_CLAUSES:
        keep |= ((j.p_brand == b) & (j.p_size >= slo) & (j.p_size <= shi)
                 & (j.l_quantity >= qlo) & (j.l_quantity <= qhi)).to_numpy()
    cents = np.floor(j.l_extendedprice.to_numpy()
                     * (1.0 - j.l_discount.to_numpy()) * 100.0).astype(
        np.int64)
    assert got.cents[0] == cents[keep].sum()
    assert got.nlines[0] == int(keep.sum())


def test_lang_gini_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lang_gini(SF).to_pandas().set_index("source")
    docs = _pq("documents")
    c = docs.groupby(["source", "lang"]).size()
    for src, g in c.groupby(level=0):
        assert got.loc[src, "n"] == g.sum()
        assert got.loc[src, "sumsq"] == (g ** 2).sum()


def test_audio_int_stats_vs_numpy(ray_session):
    from combblas_ray.functions import multimodal as M

    stage = M.AudioIntStatsStage()
    ids = [0, 3, 17, 100]
    t = pa.table({
        "item_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array([M.make_audio_blob(i) for i in ids],
                            type=pa.binary()),
    })
    out = stage(t).to_pandas().set_index("item_id")
    for i in ids:
        n = 256 + (i % 4) * 128
        pcm = ((np.arange(n) * (i + 11)) % M.AUDIO_MOD - 2000).astype(
            np.int64)
        r = out.loc[i]
        assert r.n_samples == n
        assert r.abs_sum == np.abs(pcm).sum()
        assert r.sq_sum == (pcm * pcm).sum()
        neg = pcm < 0
        assert r.zc == int((neg[1:] != neg[:-1]).sum())
