"""Brute-force twins for the wave-9 operators: TPC-H Q6, market-basket
pairs, resource-allocation link prediction, FIRST/LAST window, dense
rank, CUBE, integer-exact k-means."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_tpch_q6_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_tpch_q6

    out = q_tpch_q6(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    m = ((li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")
         & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
         & (li.l_quantity < 24))
    want = int(np.floor(li.l_extendedprice[m].to_numpy()
                        * li.l_discount[m].to_numpy() * 100.0).sum())
    assert int(out.rev_cents[0]) == want
    assert int(out.nlines[0]) == int(m.sum())


def test_basket_pairs_vs_pandas_brute(ray_session):
    from collections import Counter

    from combblas_ray.pipelines.queries import BASKET_TOPK, q_basket_pairs

    out = q_basket_pairs(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    cnt = Counter()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cnt[(ps[i], ps[j])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:BASKET_TOPK]
    got = list(zip(zip(out.a, out.b), out.cnt))
    assert got == want


def test_link_predict_ra_vs_wedge_brute(ray_session):
    from itertools import combinations

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src.to_numpy(), e.dst.to_numpy()):
        nbrs.setdefault(int(s), set()).add(int(d))
    ra: dict[tuple, int] = {}
    cn: dict[tuple, int] = {}
    for z, ns in nbrs.items():
        wz = q.RA_SCALE // len(ns)
        for a, b in combinations(sorted(ns), 2):
            ra[(a, b)] = ra.get((a, b), 0) + wz
            cn[(a, b)] = cn.get((a, b), 0) + 1
    want = sorted(
        ((s, a, b, cn[(a, b)]) for (a, b), s in ra.items()
         if cn[(a, b)] >= q.RA_MIN and b not in nbrs[a]),
        key=lambda t: (-t[0], t[1], t[2]))[:q.RA_TOPK]
    labels = np.asarray(ctx.labels)
    got = q.q_link_predict_ra(SF).to_pandas()
    la = np.searchsorted(labels, got.a.to_numpy())
    lb = np.searchsorted(labels, got.b.to_numpy())
    got_list = [tuple(map(int, t))
                for t in zip(got.score, la, lb, got.cn)]
    assert got_list == want


def test_first_last_event_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_first_last_event

    out = q_first_last_event(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id")
    first = g.first()
    last = g.last()
    cents_f = np.floor(first.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    cents_l = np.floor(last.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    assert list(out.user_id) == list(first.index)
    assert list(out.first_type) == list(first.event_type)
    assert list(out.last_type) == list(last.event_type)
    assert list(out.delta_cents) == list(cents_l - cents_f)
    assert list(out.n) == list(g.size())


def test_dense_rank_spend_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_dense_rank_spend

    out = q_dense_rank_spend(SF).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["cents"] = np.floor(od.o_totalprice.to_numpy() * 100.0
                           + 0.5).astype(np.int64)
    spend = od.groupby("o_custkey").cents.sum()
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    j = cust.join(spend.rename("spend_cents"), on="c_custkey", how="inner")
    j["drank"] = j.groupby("c_mktsegment").spend_cents.rank(
        method="dense", ascending=False).astype(np.int64)
    j = j.sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["c_custkey", "c_mktsegment", "spend_cents", "drank"]],
        j[["c_custkey", "c_mktsegment", "spend_cents", "drank"]],
        check_dtype=False)


def test_cube_counts_vs_pandas_brute(ray_session):
    from combblas_ray.pipelines.queries import q_cube_counts

    out = q_cube_counts(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    secs = ev.ts.astype("datetime64[s]").astype(np.int64)
    ev["dow"] = ((secs // 86400) + 4) % 7
    ev["cents"] = np.floor(ev.value.to_numpy() * 100.0
                           + 0.5).astype(np.int64)
    fine = ev.groupby(["event_type", "dow"]).agg(
        cnt=("cents", "size"), cents=("cents", "sum")).reset_index()
    lvl_t = ev.groupby("event_type").agg(
        cnt=("cents", "size"), cents=("cents", "sum")).reset_index()
    lvl_t["dow"] = -1
    lvl_d = ev.groupby("dow").agg(
        cnt=("cents", "size"), cents=("cents", "sum")).reset_index()
    lvl_d["event_type"] = "ALL"
    total = pd.DataFrame({"event_type": ["ALL"], "dow": [-1],
                          "cnt": [len(ev)], "cents": [ev.cents.sum()]})
    want = pd.concat([fine, lvl_t, lvl_d, total], ignore_index=True)
    cols = ["event_type", "dow", "cnt", "cents"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_kmeans_fixed_vs_numpy_brute(ray_session):
    from combblas_ray.pipelines.queries import (KM_K, KM_QSCALE, KM_ROUNDS,
                                                q_kmeans_fixed)

    out = q_kmeans_fixed(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .sort_values("vec_id").reset_index(drop=True)
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    Q = np.floor((X + 0.5) * KM_QSCALE).astype(np.int64)
    C = Q[emb.vec_id.to_numpy() < KM_K][np.argsort(
        emb.vec_id.to_numpy()[emb.vec_id.to_numpy() < KM_K])]
    for _ in range(KM_ROUNDS):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for k in range(KM_K):
            m = a == k
            if m.any():
                C[k] = Q[m].sum(axis=0) // int(m.sum())
    d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    assert np.array_equal(out.cluster.to_numpy(), want)
    # sanity: every cluster non-empty with these seeds
    assert len(np.unique(want)) == KM_K
