"""Brute twins for wave 57: diversified top-k, nation p90, order-index
curve, Fano burstiness, adjacent embedding dots."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_diverse_top_orders_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_diverse_top_orders(SF).to_pandas()
    o = _pq("orders")
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    o = o.sort_values(["cents", "o_orderkey"],
                      ascending=[False, True])
    picked, per = [], {}
    for r in o.itertuples():
        if per.get(r.o_custkey, 0) < q.DIV_PER_CUST:
            picked.append((r.o_orderkey, r.o_custkey, r.cents))
            per[r.o_custkey] = per.get(r.o_custkey, 0) + 1
        if len(picked) == q.DIV_K:
            break
    assert list(zip(got.o_orderkey, got.o_custkey, got.cents)) == picked
    # the quota binds: some customer must appear twice in the top-10
    # window OR the plain top-10 equals it; assert determinism instead
    assert len(got) == q.DIV_K


def test_nation_p90_orders_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_nation_p90_orders(SF).to_pandas().set_index("nk")
    o = _pq("orders")[["o_custkey", "o_totalprice"]]
    c = _pq("customer")[["c_custkey", "c_nationkey"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice * 100 + 0.5).astype(np.int64)
    for nk, g in j.groupby("c_nationkey"):
        v = np.sort(g.cents.to_numpy())
        n = len(v)
        p90 = v[min(n - 1, int(np.ceil(0.9 * n)) - 1)]
        row = got.loc[nk]
        assert row.n_orders == n and row.p90_cents == p90
        assert row.n_above == int((v > p90).sum())


def test_order_index_cents_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_order_index_cents(SF).to_pandas().set_index("bucket")
    o = _pq("orders").sort_values(["o_custkey", "o_orderdate",
                                   "o_orderkey"])
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    o["rn"] = o.groupby("o_custkey").cumcount() + 1
    o["bucket"] = np.minimum(o.rn, q.OIDX_BUCKETS)
    for b, g in o.groupby("bucket"):
        assert got.loc[b].n_orders == len(g)
        assert got.loc[b].sum_cents == g.cents.sum()


def test_fano_factor_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_fano_factor(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    hr = (ev.ts.astype("datetime64[us]").astype("int64")
          // 3_600_000_000)
    per = ev.assign(hr=hr).groupby(["event_type", "hr"]).size()
    for et, g in per.groupby(level=0):
        c = g.to_numpy().astype(np.int64)
        row = got.loc[et]
        assert (row.n_hours, row.sum_c, row.sum_cc) == (
            len(c), c.sum(), (c * c).sum())


def test_emb_pair_dots_vs_brute_and_boundary(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_emb_pair_dots(SF).to_pandas().set_index("vec_id")
    emb = _pq("embeddings").sort_values("vec_id")
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    assert (np.diff(ids) == 1).all()  # dense stream assumption holds
    dots = (M[:-1] * M[1:]).sum(axis=1)
    assert len(got) == len(ids) - 1
    for i in (0, 1, len(ids) - 2):
        assert int(got.loc[ids[i], "dot"]) == dots[i]
    # the block boundary pair must be present and exact
    b = q.EPD_BLK - 1
    assert b < len(ids) - 1, "corpus must span >= 2 blocks"
    assert int(got.loc[ids[b], "dot"]) == dots[b]
    assert int(got.loc[ids[b + 1], "dot"]) == dots[b + 1]
