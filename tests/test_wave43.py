"""Brute twins for wave 43: KS statistic, rank-sum U, chi-square
cells, quarterly top order, norm outliers."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _two_samples(q):
    ev = _pq("events")
    c = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    a = c[(ev.event_type == q.KS_TYPE_A).to_numpy()]
    b = c[(ev.event_type == q.KS_TYPE_B).to_numpy()]
    return a, b


def test_ks_stat_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_ks_stat(SF).to_pandas()
    a, b = _two_samples(q)
    na, nb = len(a), len(b)
    ks = 0
    for v in np.unique(np.concatenate([a, b])):
        ks = max(ks, abs(int((a <= v).sum()) * nb
                         - int((b <= v).sum()) * na))
    assert got.ks_num[0] == ks
    assert got.n_a[0] == na and got.n_b[0] == nb
    # cross-check vs scipy-free float KS definition
    d = ks / (na * nb)
    assert 0.0 <= d <= 1.0


def test_rank_sum_u_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_rank_sum_u(SF).to_pandas()
    a, b = _two_samples(q)
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv), dtype=np.float64)
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2  # midrank
        i = j
    r2a = int(round(2 * ranks[: len(a)].sum()))
    assert got.r2_sum_a[0] == r2a
    assert got.n_a[0] == len(a) and got.n_b[0] == len(b)


def test_chi2_cells_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_chi2_cells(SF).to_pandas()
    docs = _pq("documents")
    cnt = Counter(zip(docs.lang, docs.source))
    rows = Counter(docs.lang)
    cols = Counter(docs.source)
    for _, r in got.iterrows():
        assert r.obs == cnt[(r.lang, r.source)]
        assert r.row_n == rows[r.lang]
        assert r.col_n == cols[r.source]
        assert r.grand_n == len(docs)
    assert len(got) == len(cnt)


def test_quarter_top_order_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_quarter_top_order(SF).to_pandas()
    orders = _pq("orders")
    cents = np.floor(orders.o_totalprice.to_numpy() * 100.0).astype(
        np.int64)
    df = pd.DataFrame({"y": orders.o_orderdate.dt.year,
                       "q": (orders.o_orderdate.dt.month - 1) // 3 + 1,
                       "c": cents})
    want = df.groupby(["y", "q"]).c.agg(["max", "sum"])
    for _, r in got.iterrows():
        assert r.max_cents == want.loc[(r.o_year, r.quarter), "max"]
        assert r.total_cents == want.loc[(r.o_year, r.quarter), "sum"]
    assert len(got) == len(want)


def test_norm_outliers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_norm_outliers(SF).to_pandas()
    emb = _pq("embeddings")
    rows = []
    for vid, e in zip(emb.vec_id, emb.embedding):
        v = np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
        rows.append((-int((v * v).sum()), vid))
    rows.sort()
    want = rows[:q.NORM_TOPK]
    assert list(zip(got.norm2, got.vec_id)) == [
        (-n, v) for n, v in want]
