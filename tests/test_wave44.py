"""Brute twins for wave 44: RFM cells, embedding ranges, part lift,
Benford by type, slow gaps."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_rfm_cells_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_rfm_cells(SF).to_pandas()
    orders = _pq("orders")
    orders["us"] = orders.o_orderdate.astype("datetime64[us]").astype(
        "int64")
    orders["cents"] = np.floor(
        orders.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    per = orders.groupby("o_custkey").agg(
        last_us=("us", "max"), freq=("us", "size"),
        cents=("cents", "sum"))
    gmax = per.last_us.max()
    cnt = Counter()
    for _, r in per.iterrows():
        rd = (gmax - r.last_us) // 86_400_000_000
        rb = int(rd > q.RFM_R_DAYS[0]) + int(rd > q.RFM_R_DAYS[1])
        fb = int(r.freq > q.RFM_F[0]) + int(r.freq > q.RFM_F[1])
        mb = int(r.cents > q.RFM_M_CENTS[0]) + int(
            r.cents > q.RFM_M_CENTS[1])
        cnt[(rb, fb, mb)] += 1
    assert {(a, b, c): n for a, b, c, n in
            zip(got.r_band, got.f_band, got.m_band,
                got.n_customers)} == dict(cnt)


def test_emb_dim_range_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_emb_dim_range(SF).to_pandas().set_index("dim")
    emb = _pq("embeddings")
    mat = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                             * (1 << 20)).astype(np.int64)
                    for e in emb.embedding])
    for d in range(mat.shape[1]):
        assert got.loc[d, "min_q"] == mat[:, d].min()
        assert got.loc[d, "max_q"] == mat[:, d].max()


def test_part_lift_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_part_lift_topk(SF).to_pandas()
    li = _pq("lineitem")
    d = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = d.l_orderkey.nunique()
    marg = d.groupby("l_partkey").size()
    cnt = Counter()
    for ok, g in d.groupby("l_orderkey"):
        ps = sorted(g.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cnt[(ps[i], ps[j])] += 1
    rows = []
    for (a, b), cab in cnt.items():
        if cab < q.LIFT_MINSUP:
            continue
        lift = cab * n_orders * q.LIFT_SCALE // (marg[a] * marg[b])
        rows.append((-lift, a, b, cab))
    rows.sort()
    want = rows[:q.LIFT_TOPK]
    assert list(zip(got.p1, got.p2, got.support,
                    got.lift_scaled)) == [
        (a, b, c, -nl) for nl, a, b, c in want]


def test_benford_by_type_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_benford_by_type(SF).to_pandas()
    ev = _pq("events")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    cnt = Counter()
    for et, c in zip(ev.event_type, cents):
        if c > 0:
            cnt[(et, str(c)[0])] += 1
    assert {(t, d): c for t, d, c in
            zip(got.event_type, got.digit, got.cnt)} == dict(cnt)


def test_slow_gaps_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_slow_gaps(SF).to_pandas().set_index("event_type")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    gaps, over = Counter(), Counter()
    for uid, g in ev.groupby("user_id"):
        t = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        et = g.event_type.tolist()
        for i in range(len(t) - 1):
            gaps[et[i]] += 1
            if t[i + 1] - t[i] > q.SLOW_GAP_US:
                over[et[i]] += 1
    for et in gaps:
        assert got.loc[et, "n_gaps"] == gaps[et]
        assert got.loc[et, "n_over"] == over.get(et, 0)
