"""Brute twins for wave 31: ball conductance, spend Gini, trigram L1,
1-NN accuracy, segment momentum."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_ball_conductance_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_ball_conductance(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    labels = np.asarray(ctx.labels)
    root = int(np.searchsorted(labels, "m_0"))
    ball = {root}
    frontier = {root}
    for _ in range(q.BALL_R):
        nxt = set()
        for u in frontier:
            nxt |= nbrs.get(u, set())
        frontier = nxt - ball
        ball |= nxt
    vol = sum(len(nbrs.get(v, ())) for v in ball)
    ue = {(min(a, b), max(a, b)) for a in nbrs for b in nbrs[a]}
    cut = sum(1 for a, b in ue if (a in ball) != (b in ball))
    internal = sum(1 for a, b in ue if a in ball and b in ball)
    assert got.ball_size[0] == len(ball)
    assert got.volume[0] == vol
    assert got.cut_edges[0] == cut
    assert got.internal_edges[0] == internal


def test_spend_gini_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_spend_gini(SF).to_pandas()
    orders = _pq("orders")
    orders["cents"] = np.floor(
        orders.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    s = orders.groupby("o_custkey").cents.sum().reset_index()
    s = s.sort_values(["cents", "o_custkey"]).reset_index(drop=True)
    n = len(s)
    rank = np.arange(1, n + 1)
    num = int(((2 * rank - n - 1) * s.cents.to_numpy()).sum())
    assert got.n[0] == n
    assert got.total_cents[0] == s.cents.sum()
    assert got.gini_num[0] == num
    # Gini numerator equals sum of pairwise absolute differences
    x = s.cents.to_numpy()
    pair_sum = np.abs(x[:, None] - x[None, :]).sum() // 2
    assert num == pair_sum


def test_trigram_l1_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_trigram_l1(SF).to_pandas()
    docs = _pq("documents")
    ca, cb = Counter(), Counter()
    for lang, text in zip(docs.lang, docs.text):
        tgt = ca if lang == q.TRI_LANG_A else (
            cb if lang == q.TRI_LANG_B else None)
        if tgt is None:
            continue
        for i in range(len(text) - 2):
            tgt[text[i:i + 3]] += 1
    keys = set(ca) | set(cb)
    assert got.l1_dist[0] == sum(
        abs(ca.get(k, 0) - cb.get(k, 0)) for k in keys)
    assert got.mass_a[0] == sum(ca.values())
    assert got.mass_b[0] == sum(cb.values())


def test_knn1_accuracy_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_knn1_accuracy(SF).to_pandas()
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.KNN1_N].sort_values("vec_id")
    Q = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                           * (1 << 20)).astype(np.int64)
                  for e in emb.embedding])
    lab = emb.label.to_numpy()
    d = Q @ Q.T
    np.fill_diagonal(d, np.iinfo(np.int64).min)
    nn = d.argmax(axis=1)
    assert got.n[0] == len(Q)
    assert got.n_correct[0] == int((lab[nn] == lab).sum())


def test_segment_momentum_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_segment_momentum(SF).to_pandas()
    orders, cust = _pq("orders"), _pq("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100.0).astype(
        np.int64)
    m = (j.groupby(["c_mktsegment", j.o_orderdate.dt.year,
                    j.o_orderdate.dt.month]).cents.sum())
    for seg in m.index.get_level_values(0).unique():
        sub = got[got.c_mktsegment == seg].sort_values(
            ["o_year", "o_month"])
        ms = m.loc[seg].sort_index()
        assert sub.cents.tolist() == ms.tolist()
        deltas = sub.delta.tolist()
        assert np.isnan(deltas[0])
        assert deltas[1:] == list(np.diff(ms.to_numpy()))
