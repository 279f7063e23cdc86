"""Brute twins for wave 51: 1-NN confusion, repeat buyers, cross-modal
lang norms, msbfs distance histogram, bigram vocabulary growth."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_knn_confusion_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_knn_confusion(SF).to_pandas()
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.KNN1_N].sort_values("vec_id")
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    lab = emb.label.to_numpy().astype(np.int64)
    d = M @ M.T
    np.fill_diagonal(d, np.iinfo(np.int64).min)
    best = np.argmax(d, axis=1)  # tie -> lowest id
    want = Counter(zip(lab.tolist(), lab[best].tolist()))
    got_c = {(t, p): n for t, p, n in
             zip(got.true_label, got.pred_label, got.n)}
    assert got_c == dict(want)
    # diagonal sum must equal knn1_accuracy's n_correct
    acc = q.q_knn1_accuracy(SF).to_pandas()
    diag = sum(n for (t, p), n in got_c.items() if t == p)
    assert diag == acc.n_correct[0] and sum(got_c.values()) == acc.n[0]


def test_repeat_buyers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_repeat_buyers(SF).to_pandas().set_index("o_custkey")
    o = _pq("orders")
    ym = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    per = o.groupby(["o_custkey", ym]).size()
    want = {}
    for ck, g in per.groupby(level=0):
        rep = int((g >= 2).sum())
        if rep:
            want[ck] = (rep, int(g.max()))
    assert len(got) == len(want)
    for ck, (rep, mx) in want.items():
        assert (got.loc[ck].n_repeat_months,
                got.loc[ck].max_month_orders) == (rep, mx)


def test_lang_norm_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lang_norm_stats(SF).to_pandas().set_index("lang")
    emb = _pq("embeddings")
    docs = _pq("documents")[["doc_id", "lang"]]
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    n2 = (M * M).sum(axis=1)
    j = docs.merge(emb[["vec_id"]].assign(n2=n2),
                   left_on="doc_id", right_on="vec_id")
    for lang, g in j.groupby("lang"):
        assert got.loc[lang].n == len(g)
        assert got.loc[lang].sum_norm2 == g.n2.sum()


def test_distance_hist_matches_msbfs(ray_session):
    from combblas_ray.pipelines import queries as q

    hist = q.q_distance_hist(SF).to_pandas()
    per = q.q_msbfs(SF).to_pandas()
    want = per.dist.value_counts().to_dict()
    assert dict(zip(hist.dist, hist.n_vertices)) == want


def test_vocab_growth_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_vocab_growth(SF).to_pandas()
    docs = _pq("documents").sort_values("doc_id")
    n = len(docs)
    first = {}
    for did, text in zip(docs.doc_id, docs.text):
        t = text.split(" ")
        for a, b in zip(t[:-1], t[1:]):
            first.setdefault(a + " " + b, did)
    cnt = Counter(int(np.floor(md * q.VG_BUCKETS / np.float64(n)))
                  for md in first.values())
    assert dict(zip(got.decile, got.new_tokens)) == dict(cnt)
    assert got.new_tokens.sum() == len(first)
