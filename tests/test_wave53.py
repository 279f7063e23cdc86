"""Brute twins for wave 53: prefix census, triangle repo mix, discount
monotonicity, top-k year overlap, record-breaking events."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_prefix_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_prefix_census(SF).to_pandas()
    vocab = set()
    for text in _pq("documents").text:
        vocab.update(text.split(" "))
    vocab.discard("")
    want = {d: len({w[:d] for w in vocab if len(w) >= d})
            for d in range(1, q.PREFIX_D + 1)}
    want = {d: n for d, n in want.items() if n}
    assert dict(zip(got.depth, got.n_prefixes)) == want


def test_tri_repo_mix_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_tri_repo_mix(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    cnt = Counter()
    for u in nbrs:
        for w in nbrs[u]:
            if w <= u:
                continue
            for v in nbrs[u] & nbrs[w]:
                if v > w:
                    rs = {ar[u] % 100, ar[w] % 100, ar[v] % 100}
                    cnt[len(rs)] += 1
    assert dict(zip(got.n_repos, got.n_triangles)) == dict(cnt)
    # total must equal the triangle count query
    tc = q.q_triangle_count(SF).to_pandas().triangles[0]
    assert got.n_triangles.sum() == tc


def test_disc_monotone_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_disc_monotone(SF).to_pandas()
    li = _pq("lineitem")
    li["dc"] = np.floor(li.l_discount * 100 + 0.5).astype(np.int64)
    li = li.sort_values(["l_orderkey", "l_linenumber", "dc"])
    n_nm = n_v = 0
    for ok_, g in li.groupby("l_orderkey"):
        inc = int((np.diff(g.dc.to_numpy()) > 0).sum())
        n_v += inc
        n_nm += int(inc > 0)
    assert got.n_orders[0] == li.l_orderkey.nunique()
    assert (got.n_nonmonotone[0], got.n_violations[0]) == (n_nm, n_v)


def test_topk_overlap_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_topk_overlap(SF).to_pandas()
    o = _pq("orders")
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    o["yr"] = o.o_orderdate.dt.year
    tops = []
    for yr in q.TOPK_YEARS:
        s = (o[o.yr == yr].groupby("o_custkey").cents.sum()
             .reset_index()
             .sort_values(["cents", "o_custkey"],
                          ascending=[False, True]))
        tops.append(set(s.o_custkey.head(q.TOPK_K)))
    assert got.k[0] == q.TOPK_K
    assert got.n_overlap[0] == len(tops[0] & tops[1])


def test_record_counts_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_record_counts(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    ev["c"] = np.floor(ev.value * 100 + 0.5).astype(np.int64)
    ev = ev.sort_values(["event_type", "ts", "event_id"])
    for et, g in ev.groupby("event_type"):
        v = g.c.to_numpy()
        rm = np.maximum.accumulate(v)
        rec = 1 + int((v[1:] > rm[:-1]).sum())
        assert got.loc[et].n_events == len(v)
        assert got.loc[et].n_records == rec
