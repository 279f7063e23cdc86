"""Brute twins for wave 68: suffix census, edge degree grid, same-day
orders, blob byte histogram."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_suffix_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_suffix_census(SF).to_pandas()
    vocab = set()
    for text in _pq("documents").text:
        vocab.update(text.split(" "))
    vocab.discard("")
    want = {d: len({w[-d:] for w in vocab if len(w) >= d})
            for d in range(1, q.PREFIX_D + 1)}
    want = {d: n for d, n in want.items() if n}
    assert dict(zip(got.depth, got.n_suffixes)) == want


def test_edge_deg_grid_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_edge_deg_grid(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    cnt = Counter()
    for u, ns in nbrs.items():
        for v in ns:
            if u < v:
                bu = int(np.floor(np.log2(len(nbrs[u]))))
                bv = int(np.floor(np.log2(len(nbrs[v]))))
                cnt[(min(bu, bv), max(bu, bv))] += 1
    got_d = {(r.lo_bucket, r.hi_bucket): r.n_edges
             for r in got.itertuples()}
    assert got_d == dict(cnt)


def test_same_day_orders_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_same_day_orders(SF).to_pandas()
    o = _pq("orders")
    day = (o.o_orderdate.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    per = o.assign(day=day).groupby(["o_custkey", "day"]).size()
    m = per[per >= 2]
    assert got.n_customers[0] == len({ck for ck, _ in m.index})
    assert got.n_cust_days[0] == len(m)
    assert got.n_orders_involved[0] == int(m.sum())


def test_blob_bytes_hist_vs_brute(ray_session):
    from combblas_ray.functions import multimodal as M
    from combblas_ray.pipelines import queries as q

    got = q.q_blob_bytes_hist(SF).to_pandas()
    ids = _pq("documents").doc_id.to_numpy()
    cnt = Counter()
    makers = {"image": M.make_blob, "audio": M.make_audio_blob,
              "video": M.make_video_blob}
    for kind, mk in makers.items():
        for i in ids:
            cnt[(kind, len(mk(int(i))))] += 1
    got_d = {(r.kind, r.nbytes): r.n_items for r in got.itertuples()}
    assert got_d == dict(cnt)
