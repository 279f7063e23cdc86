"""Brute twins for wave 63: brand rank concordance, 2-hop ball census,
dedup share by source, type gap medians, brand price mode."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_brand_rank_concordance_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_brand_rank_concordance(SF).to_pandas()
    li = _pq("lineitem")
    o = _pq("orders")[["o_orderkey", "o_orderdate"]]
    p = _pq("part")[["p_partkey", "p_brand"]]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(p, left_on="l_partkey", right_on="p_partkey"))
    j["yr"] = j.o_orderdate.dt.year
    j["cents"] = np.floor(j.l_extendedprice * (1 - j.l_discount)
                          * 100).astype(np.int64)
    j = j[j.yr.isin(q.BRC_YEARS)]
    rev = j.groupby(["p_brand", "yr"]).cents.sum()
    brands = sorted({b for b, _ in rev.index})
    a = np.array([rev.get((b, q.BRC_YEARS[0]), 0) for b in brands])
    b = np.array([rev.get((b, q.BRC_YEARS[1]), 0) for b in brands])
    conc = disc = tie = 0
    for i in range(len(brands)):
        for k in range(i + 1, len(brands)):
            da, db = a[i] - a[k], b[i] - b[k]
            if da == 0 or db == 0:
                tie += 1
            elif (da > 0) == (db > 0):
                conc += 1
            else:
                disc += 1
    assert (got.n_concordant[0], got.n_discordant[0],
            got.n_tied[0]) == (conc, disc, tie)
    assert got.n_pairs[0] == conc + disc + tie


def test_reach2_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_reach2_hist(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    cnt = Counter()
    for v, ns in nbrs.items():
        ball = set(ns)
        for u in ns:
            ball |= nbrs[u]
        ball.discard(v)
        cnt[len(ball)] += 1
    assert dict(zip(got.ball_size, got.n_vertices)) == dict(cnt)


def test_dedup_share_by_source_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_dedup_share_by_source(SF).to_pandas().set_index("source")
    docs = _pq("documents")
    key = docs.text.map(
        lambda t: " ".join(sorted(set(t.split(" ")))))
    canon_id = docs.assign(key=key).groupby("key").doc_id.transform(
        "min")
    canon = (docs.doc_id == canon_id)
    per = docs.assign(canon=canon).groupby("source").agg(
        n_docs=("doc_id", "size"), n_canonical=("canon", "sum"))
    for src_, row in per.iterrows():
        g = got.loc[src_]
        assert (g.n_docs, g.n_canonical) == (row.n_docs,
                                             row.n_canonical)


def test_type_gap_median_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_type_gap_median(SF).to_pandas().set_index("event_type")
    ev = _pq("events").sort_values(["event_type", "ts", "event_id"])
    for et, g in ev.groupby("event_type"):
        t = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        gaps = np.sort(np.diff(t))
        n = len(gaps)
        row = got.loc[et]
        assert row.n_gaps == n
        assert row.gap_q50_us == gaps[
            min(n - 1, int(np.ceil(0.5 * n)) - 1)]
        assert row.gap_q90_us == gaps[
            min(n - 1, int(np.ceil(0.9 * n)) - 1)]


def test_brand_price_mode_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_brand_price_mode(SF).to_pandas().set_index("p_brand")
    p = _pq("part")
    p["cents"] = np.floor(p.p_retailprice * 100 + 0.5).astype(np.int64)
    for br, g in p.groupby("p_brand"):
        vc = (g.groupby("cents").size().reset_index(name="n")
               .sort_values(["n", "cents"], ascending=[False, True]))
        row = got.loc[br]
        assert (row.modal_cents, row.n) == (vc.cents.iloc[0],
                                            vc.n.iloc[0])
