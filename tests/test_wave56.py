"""Brute twins for wave 56: monthly autocorrelation, audience overlap,
home-supplied customers, hourly uniques, multi-supplier orders."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_orders_autocorr_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_orders_autocorr(SF).to_pandas()
    o = _pq("orders")
    ym = (o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month)
    c = ym.value_counts().sort_index().to_numpy().astype(np.int64)
    assert got.n_months[0] == len(c)
    assert got.sum_c[0] == c.sum()
    assert got.sum_cc[0] == (c * c).sum()
    assert got.sum_lag[0] == (c[:-1] * c[1:]).sum()


def test_type_audience_jaccard_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_type_audience_jaccard(SF).to_pandas()
    ev = _pq("events")
    aud = {t: set(g.user_id) for t, g in ev.groupby("event_type")}
    types = sorted(aud)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            want[(a, b)] = (len(aud[a]), len(aud[b]),
                            len(aud[a] & aud[b]))
    got_d = {(r.ta, r.tb): (r.n_a, r.n_b, r.n_both)
             for r in got.itertuples()}
    assert got_d == want


def test_home_supplied_customers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = int(q.q_home_supplied_customers(SF).to_pandas().n_home[0])
    li = _pq("lineitem")[["l_orderkey", "l_suppkey"]]
    o = _pq("orders")[["o_orderkey", "o_custkey"]]
    c = _pq("customer")[["c_custkey", "c_nationkey"]]
    s = _pq("supplier")[["s_suppkey", "s_nationkey"]]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    want = j[j.c_nationkey == j.s_nationkey].o_custkey.nunique()
    assert got == want


def test_hourly_uniques_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_hourly_uniques(SF).to_pandas()
    ev = _pq("events")
    hr = (ev.ts.astype("datetime64[us]").astype("int64")
          // 3_600_000_000)
    want = (ev.assign(hr=hr)
              .groupby(["event_type", "hr"]).user_id.nunique())
    got_d = {(r.event_type, r.hr): r.n_users for r in got.itertuples()}
    assert got_d == want.to_dict()


def test_multi_supplier_orders_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_multi_supplier_orders(SF).to_pandas()
    li = _pq("lineitem")
    per = li.groupby("l_orderkey").agg(
        ns=("l_suppkey", "nunique"), npt=("l_partkey", "nunique"))
    assert got.n_orders[0] == int(
        ((per.ns >= q.MSO_SUPP) & (per.npt >= q.MSO_PART)).sum())
    assert got.max_supps[0] == per.ns.max()
    assert got.max_parts[0] == per.npt.max()
