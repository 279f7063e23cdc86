"""Brute twins for wave 47: monthly active customers, round bias,
dimension sign correlation, user span, part-name vocabulary."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_monthly_active_customers_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_monthly_active_customers(SF).to_pandas()
    orders = _pq("orders")
    m = orders.groupby([orders.o_orderdate.dt.year,
                        orders.o_orderdate.dt.month]
                       ).o_custkey.nunique()
    for y, mo, n in zip(got.o_year, got.o_month,
                        got.active_customers):
        assert n == m.loc[(y, mo)]
    assert len(got) == len(m)


def test_round_bias_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_round_bias(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "r": cents % 100 == 0})
    for et, g in df.groupby("t"):
        assert got.loc[et, "n"] == len(g)
        assert got.loc[et, "n_round"] == int(g.r.sum())


def test_dim_sign_corr_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_dim_sign_corr(SF).to_pandas()
    emb = _pq("embeddings")
    mat = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                             * (1 << 20)).astype(np.int64)
                    for e in emb.embedding])
    B = np.where(mat > q.SIGN_MID, 1, -1)
    G = B.T @ B
    n = len(mat)
    rows = []
    for i in range(G.shape[0]):
        for j in range(i + 1, G.shape[0]):
            rows.append((-(n + G[i, j]) // 2, i, j))
    rows.sort()
    want = [(i, j, -na) for na, i, j in rows[:q.SIGN_TOPK]]
    assert list(zip(got.dim_i, got.dim_j, got.agree)) == want
    assert (got.n == n).all()


def test_user_span_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_user_span(SF).to_pandas().set_index("user_id")
    ev = _pq("events")
    day = (ev.ts.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    df = pd.DataFrame({"u": ev.user_id, "d": day})
    for uid, g in df.groupby("u"):
        assert got.loc[uid, "span_days"] == g.d.max() - g.d.min()
        assert got.loc[uid, "n_events"] == len(g)


def test_pname_vocab_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_pname_vocab_topk(SF).to_pandas()
    part = _pq("part")
    cnt = Counter()
    for nm in part.p_name:
        cnt.update(nm.split(" "))
    want = sorted(cnt, key=lambda k: (-cnt[k], k))[:q.PNAME_TOPK]
    assert got.word.tolist() == want
    assert got.cnt.tolist() == [cnt[w] for w in want]
