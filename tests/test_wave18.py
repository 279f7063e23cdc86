"""Brute twins for wave 18: TPC-H Q2/Q8/Q11/Q20 adaptations + Bloom
probe."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _cents(price, disc):
    return np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)


def test_tpch_q2_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q2(SF).to_pandas().sort_values(
        "p_partkey").reset_index(drop=True)
    li, part, sup = _pq("lineitem"), _pq("part"), _pq("supplier")
    pairs = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    part = part[part.p_name.str.contains(q.Q2_SUB)
                & part.p_size.isin(q.Q2_SIZES)]
    sup = sup.assign(bal_cents=np.floor(
        sup.s_acctbal.to_numpy() * 100.0).astype(np.int64))
    cand = (pairs.merge(part, left_on="l_partkey", right_on="p_partkey")
                 .merge(sup, left_on="l_suppkey", right_on="s_suppkey"))
    cand = cand.sort_values(["p_partkey", "bal_cents", "s_suppkey"])
    want = cand.groupby("p_partkey", as_index=False).first()[
        ["p_partkey", "p_name", "s_suppkey", "s_name", "bal_cents"]]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False)


def test_tpch_q8_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q8(SF).to_pandas()
    li, orders, cust = _pq("lineitem"), _pq("orders"), _pq("customer")
    nat, reg, sup = _pq("nation"), _pq("region"), _pq("supplier")
    n2r = dict(zip(nat.n_nationkey, nat.n_regionkey))
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(sup, left_on="l_suppkey", right_on="s_suppkey"))
    j["creg"] = j.c_nationkey.map(n2r)
    j["sreg"] = j.s_nationkey.map(n2r)
    j["cents"] = _cents(j.l_extendedprice.to_numpy(),
                        j.l_discount.to_numpy())
    j["local"] = np.where(j.creg == j.sreg, j.cents, 0)
    j["o_year"] = j.o_orderdate.dt.year.astype(np.int64)
    rn = dict(zip(reg.r_regionkey, reg.r_name))
    j["r_name"] = j.creg.map(rn)
    want = (j.groupby(["r_name", "o_year"], as_index=False)
             .agg(total_cents=("cents", "sum"),
                  local_cents=("local", "sum")))
    cols = ["r_name", "o_year"]
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tpch_q11_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q11(SF).to_pandas().sort_values(
        "l_partkey").reset_index(drop=True)
    li = _pq("lineitem")
    li["cents"] = _cents(li.l_extendedprice.to_numpy(),
                         li.l_discount.to_numpy())
    v = li.groupby("l_partkey", as_index=False).cents.sum().rename(
        columns={"cents": "value_cents"})
    n, s = len(v), v.value_cents.sum()
    want = v[10 * v.value_cents * n > 13 * s].sort_values(
        "l_partkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns],
                                  check_dtype=False)


def test_tpch_q20_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tpch_q20(SF).to_pandas().sort_values(
        ["l_partkey", "l_suppkey"]).reset_index(drop=True)
    li = _pq("lineitem")
    li = li[(li.l_shipdate >= f"{q.Q20_YEAR}-01-01")
            & (li.l_shipdate < f"{q.Q20_YEAR + 1}-01-01")].copy()
    li["qty"] = li.l_quantity.astype(np.int64)
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False).qty.sum()
    tot = ps.groupby("l_partkey").qty.sum()
    ps["total_qty"] = ps.l_partkey.map(tot)
    want = ps[2 * ps.qty > ps.total_qty].sort_values(
        ["l_partkey", "l_suppkey"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns],
                                  check_dtype=False)


def test_bloom_probe_vs_numpy(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q

    got = q.q_bloom_probe(SF).to_pandas()
    cust, orders = _pq("customer"), _pq("orders")
    keys = set(cust[cust.c_mktsegment == q.BLOOM_SEG].c_custkey)
    bits = np.zeros(q.BLOOM_M, dtype=bool)
    for k in keys:
        h = md5_lower64(str(int(k)))
        for j in range(q.BLOOM_K):
            bits[(h >> (14 * j)) & (q.BLOOM_M - 1)] = True

    def pos(x):
        h = md5_lower64(str(int(x)))
        return all(bits[(h >> (14 * j)) & (q.BLOOM_M - 1)]
                   for j in range(q.BLOOM_K))

    oc = orders.o_custkey.to_numpy()
    assert got.n_orders[0] == len(oc)
    assert got.n_true[0] == sum(int(x) in keys for x in oc)
    assert got.n_pos[0] == sum(pos(x) for x in oc)
    # a Bloom filter never yields false negatives
    assert got.n_pos[0] >= got.n_true[0]
