"""Brute twins for wave 38: language confusion, DAG path counts,
positional profile, price spread, order-size histogram."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

MARKERS = {"de": "sort", "en": "the", "es": "data", "fr": "join",
           "zh": "batch"}


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_lang_confusion_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lang_confusion(SF).to_pandas()
    docs = _pq("documents")
    langs = sorted(MARKERS)
    cnt = Counter()
    for lang, text in zip(docs.lang, docs.text):
        toks = text.split(" ")
        scores = [toks.count(MARKERS[l]) for l in langs]
        pred = langs[int(np.argmax(scores))]
        cnt[(lang, pred)] += 1
    assert {(a, b): c for a, b, c in
            zip(got.true_lang, got.pred_lang, got.cnt)} == dict(cnt)


def test_dag_path_counts_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_dag_path_counts(SF).to_pandas().set_index("label")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    dag = sorted({(s, d) for s, d in zip(e.src, e.dst) if s < d})
    n = ctx.n
    # topological (ascending-id) DP to the exact fixpoint
    cnt = np.ones(n, dtype=object)
    ins = {}
    for s, d in dag:
        ins.setdefault(d, []).append(s)
    for v in range(n):
        if v in ins:
            cnt[v] = (1 + sum(cnt[u] for u in ins[v])) % q.PATHC_MOD
    labels = np.asarray(ctx.labels)
    for i in range(n):
        assert got.loc[labels[i], "paths"] == int(cnt[i])


def test_pos_profile_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_pos_profile(SF).to_pandas().set_index("bucket")
    docs = _pq("documents")
    h = [0, 0]
    t = [0, 0]
    for text in docs.text:
        for i, tok in enumerate(text.split(" ")):
            tgt = h if i < q.POS_HEAD else t
            tgt[0] += 1
            tgt[1] += len(tok)
    assert got.loc["head", "n_tokens"] == h[0]
    assert got.loc["head", "sum_len"] == h[1]
    assert got.loc["tail", "n_tokens"] == t[0]
    assert got.loc["tail", "sum_len"] == t[1]


def test_price_spread_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_price_spread(SF).to_pandas()
    li = _pq("lineitem")
    c = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(np.int64)
    df = pd.DataFrame({"p": li.l_partkey, "c": c})
    g = df.groupby("p").c.agg(["min", "max", "size"])
    g["spread"] = g["max"] - g["min"]
    g = g.sort_values(["spread"], ascending=False)
    g = g.reset_index().sort_values(
        ["spread", "p"], ascending=[False, True]).head(q.SPREAD_TOPK)
    assert got.l_partkey.tolist() == g.p.tolist()
    assert got.spread.tolist() == g.spread.tolist()
    assert got.n_lines.tolist() == g["size"].tolist()


def test_order_lines_hist_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_order_lines_hist(SF).to_pandas().set_index("n_lines")
    li = _pq("lineitem")
    cnt = Counter(Counter(li.l_orderkey).values())
    assert dict(zip(got.index, got.n_orders)) == dict(cnt)
