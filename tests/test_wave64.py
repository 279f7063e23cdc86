"""Brute twins for wave 64: customer concentration, weekend split,
name-key audit, id alignment, region profile."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_cust_concentration_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_cust_concentration(SF).to_pandas()
    o = _pq("orders")
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    cnt = Counter()
    for ck, g in o.groupby("o_custkey"):
        cnt[min(int(g.cents.max()) * 10 // int(g.cents.sum()), 9)] += 1
    assert dict(zip(got.decile, got.n_customers)) == dict(cnt)


def test_weekend_split_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_weekend_split(SF).to_pandas()
    ev = _pq("events")
    day = (ev.ts.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    wk = ((day % 7 == 2) | (day % 7 == 3)).astype(int)
    cents = np.floor(ev.value * 100 + 0.5).astype(np.int64)
    agg = {}
    for et, w, c in zip(ev.event_type, wk, cents):
        e = agg.setdefault((et, int(w)), [0, 0])
        e[0] += 1
        e[1] += int(c)
    got_d = {(r.event_type, r.is_weekend): (r.n, r.sum_cents)
             for r in got.itertuples()}
    assert got_d == {k: tuple(v) for k, v in agg.items()}
    # weekend classification sanity: Jan 1 1970 was a Thursday
    assert int(np.datetime64("1970-01-03").astype(
        "datetime64[D]").astype(int)) % 7 == 2  # Saturday


def test_name_key_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_name_key_audit(SF).to_pandas().set_index("tbl")
    c = _pq("customer")
    parsed = c.c_name.str.split("#").str[1].astype(np.int64)
    assert got.loc["customer"].n_rows == len(c)
    assert got.loc["customer"].n_match == int(
        (parsed == c.c_custkey).sum())
    assert got.loc["customer"].sum_parsed == int(parsed.sum())
    s = _pq("supplier")
    sp = s.s_name.str.split("#").str[1].astype(np.int64)
    assert got.loc["supplier"].n_match == int((sp == s.s_suppkey).sum())


def test_id_alignment_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_id_alignment_audit(SF).to_pandas()
    e = set(_pq("embeddings").vec_id)
    d = set(_pq("documents").doc_id)
    assert got.n_aligned[0] == len(e & d)
    assert got.n_emb_only[0] == len(e - d)
    assert got.n_doc_only[0] == len(d - e)


def test_region_profile_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_region_profile(SF).to_pandas().set_index("r_name")
    n = _pq("nation")
    r = _pq("region")
    c = _pq("customer").merge(n, left_on="c_nationkey",
                              right_on="n_nationkey")
    s = _pq("supplier").merge(n, left_on="s_nationkey",
                              right_on="n_nationkey")
    for _, row in r.iterrows():
        g = got.loc[row.r_name]
        assert g.n_nations == int(
            (n.n_regionkey == row.r_regionkey).sum())
        assert g.n_customers == int(
            (c.n_regionkey == row.r_regionkey).sum())
        assert g.n_suppliers == int(
            (s.n_regionkey == row.r_regionkey).sum())
