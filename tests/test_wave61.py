"""Brute twins for wave 61: daily new users, centroid distances,
priority escalation, supplier brand span, discount-band share."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_daily_new_users_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_daily_new_users(SF).to_pandas().set_index("day")
    ev = _pq("events")
    day = (ev.ts.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    e = ev.assign(day=day)
    act = e.groupby("day").user_id.nunique()
    first = e.groupby("user_id").day.min()
    new = first.value_counts()
    assert len(got) == len(act)
    for d, na in act.items():
        assert got.loc[d].n_active == na
        assert got.loc[d].n_new == int(new.get(d, 0))
    assert got.n_new.sum() == e.user_id.nunique()


def test_centroid_dists_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_centroid_dists(SF).to_pandas()
    emb = _pq("embeddings")
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    lab = emb.label.to_numpy().astype(np.int64)
    ul = np.unique(lab)
    C = {}
    for l_ in ul:
        sub = M[lab == l_]
        C[int(l_)] = np.array([s // len(sub) for s in
                               sub.sum(axis=0)], dtype=np.int64)
    got_d = {(r.la, r.lb): r.dist2 for r in got.itertuples()}
    for i, a in enumerate(ul.tolist()):
        for b in ul.tolist()[i + 1:]:
            diff = C[a] - C[b]
            assert got_d[(a, b)] == int((diff * diff).sum())


def test_priority_escalation_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_priority_escalation(SF).to_pandas()
    o = _pq("orders").sort_values(["o_custkey", "o_orderdate",
                                   "o_orderkey"])
    o["dig"] = o.o_orderpriority.str[0].astype(int)
    up = down = same = 0
    for ck, g in o.groupby("o_custkey"):
        d = np.diff(g.dig.to_numpy())
        up += int((d < 0).sum())
        down += int((d > 0).sum())
        same += int((d == 0).sum())
    assert (got.n_up[0], got.n_down[0], got.n_same[0]) == (
        up, down, same)


def test_supplier_brand_span_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_supplier_brand_span(SF).to_pandas()
    li = _pq("lineitem")[["l_suppkey", "l_partkey"]]
    p = _pq("part")[["p_partkey", "p_brand"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    per = j.groupby("l_suppkey").p_brand.nunique()
    want = Counter(per.to_numpy().tolist())
    assert dict(zip(got.brands, got.n_suppliers)) == dict(want)


def test_disc_band_share_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_disc_band_share(SF).to_pandas().set_index("band")
    li = _pq("lineitem")
    dc = np.floor(li.l_discount * 100 + 0.5).astype(np.int64)
    cents = np.floor(li.l_extendedprice * 100 + 0.5).astype(np.int64)
    band = np.searchsorted(np.array(q.DISC_BANDS[1:]), dc,
                           side="right")
    for b in np.unique(band):
        assert got.loc[b].n_lines == int((band == b).sum())
        assert got.loc[b].sum_cents == int(cents[band == b].sum())
