"""Pandas brute-force twins for the wave-16 relational operators:
TPC-H Q7 / Q15 / Q17 / Q22 and the regression sufficient statistics."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_tpch_q7_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q7(SF).to_pandas()

    li, orders = _pq("lineitem"), _pq("orders")
    cust, sup, nat = _pq("customer"), _pq("supplier"), _pq("nation")
    li = li[(li.l_shipdate >= f"{q.Q7_LO_YEAR}-01-01")
            & (li.l_shipdate < f"{q.Q7_HI_YEAR}-01-01")]
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(sup, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.s_nationkey != j.c_nationkey]
    j["rev"] = np.floor(
        j.l_extendedprice.to_numpy()
        * (1.0 - j.l_discount.to_numpy()) * 100.0).astype(np.int64)
    j["l_year"] = j.l_shipdate.dt.year.astype(np.int64)
    nm = dict(zip(nat.n_nationkey, nat.n_name))
    j["supp_nation"] = j.s_nationkey.map(nm)
    j["cust_nation"] = j.c_nationkey.map(nm)
    want = (j.groupby(["supp_nation", "cust_nation", "l_year"],
                      as_index=False).rev.sum()
             .rename(columns={"rev": "rev_cents"}))
    cols = ["supp_nation", "cust_nation", "l_year"]
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tpch_q15_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q15(SF).to_pandas()

    li, sup = _pq("lineitem"), _pq("supplier")
    lo = "%04d-%02d-%02d" % q.Q15_LO
    hi = "%04d-%02d-%02d" % q.Q15_HI
    li = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)].copy()
    li["rev"] = np.floor(
        li.l_extendedprice.to_numpy()
        * (1.0 - li.l_discount.to_numpy()) * 100.0).astype(np.int64)
    per = li.groupby("l_suppkey").rev.sum()
    best = per.max()
    winners = sorted(per[per == best].index)
    nm = dict(zip(sup.s_suppkey, sup.s_name))
    assert got.s_suppkey.tolist() == winners
    assert got.s_name.tolist() == [nm[w] for w in winners]
    assert (got.total_rev_cents == best).all()


def test_tpch_q17_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q17(SF).to_pandas()

    li, part = _pq("lineitem"), _pq("part")
    pk = part[part.p_brand == q.Q17_BRAND].p_partkey
    li = li[li.l_partkey.isin(pk)].copy()
    li["qty"] = li.l_quantity.astype(np.int64)
    st = li.groupby("l_partkey").qty.agg(["count", "sum"])
    cnt = li.l_partkey.map(st["count"]).to_numpy()
    sq = li.l_partkey.map(st["sum"]).to_numpy()
    low = 5 * li.qty.to_numpy() * cnt < sq
    cents = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(
        np.int64)
    assert got.cents[0] == cents[low].sum()
    assert got.nlines[0] == int(low.sum())


def test_tpch_q22_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q22(SF).to_pandas()

    cust, orders = _pq("customer"), _pq("orders")
    cust = cust[cust.c_mktsegment.isin(q.Q22_SEGS)].copy()
    cust["bc"] = np.floor(cust.c_acctbal.to_numpy() * 100.0).astype(
        np.int64)
    pos = cust[cust.c_acctbal > 0.0]
    n_pos, sum_pos = len(pos), pos.bc.sum()
    cut = "%04d-%02d-%02d" % q.Q22_CUTOFF
    recent = set(orders[orders.o_orderdate >= cut].o_custkey)
    keep = cust[(cust.bc * n_pos > sum_pos)
                & ~cust.c_custkey.isin(recent)]
    want = (keep.groupby("c_mktsegment")
                .agg(numcust=("bc", "size"), totbal_cents=("bc", "sum"))
                .reset_index())
    got = got.sort_values("c_mktsegment").reset_index(drop=True)
    want = want.sort_values("c_mktsegment").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns],
                                  check_dtype=False)


def test_regr_stats_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_regr_stats(SF).to_pandas().set_index("event_type")

    ev = _pq("events")
    x = ((ev.ts.astype("int64") // 10**6) // 3600) % 24
    y = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "x": x.to_numpy(), "y": y})
    for et, g in df.groupby("t"):
        r = got.loc[et]
        assert r.n == len(g)
        assert r.sum_x == g.x.sum() and r.sum_y == g.y.sum()
        assert r.sum_xy == (g.x * g.y).sum()
        assert r.sum_x2 == (g.x * g.x).sum()
        assert r.sum_y2 == (g.y * g.y).sum()
