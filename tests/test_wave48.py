"""Brute twins for wave 48: session size histogram, degree tails,
document extremes."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_session_size_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_session_size_hist(SF).to_pandas().set_index("size")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    gap = q.SESSION_GAP_MIN * 60_000_000
    cnt = Counter()
    for uid, g in ev.groupby("user_id"):
        t = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        new = np.concatenate(([True], np.diff(t) > gap))
        for sz in np.bincount(np.cumsum(new))[1:]:
            cnt[sz] += 1
    assert dict(zip(got.index, got.n_sessions)) == dict(cnt)
    # cross-check vs bounce_stats
    b = q.q_bounce_stats(SF).to_pandas()
    assert b.n_sessions[0] == sum(cnt.values())
    assert b.n_bounce[0] == cnt.get(1, 0)


def test_degree_tails_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_degree_tails(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    deg = np.zeros(ctx.n, dtype=np.int64)
    for v, ns in nbrs.items():
        deg[v] = len(ns)
    assert got.n_isolated[0] == int((deg == 0).sum())
    assert got.n_pendant[0] == int((deg == 1).sum())
    assert got.max_deg[0] == deg.max()
    assert got.n_at_max[0] == int((deg == deg.max()).sum())


def test_doc_length_extremes_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_doc_length_extremes(SF).to_pandas()
    docs = _pq("documents")
    lo = min(zip(docs.n_chars, docs.doc_id))
    hi = min(zip(-docs.n_chars, docs.doc_id))
    assert (got.min_chars[0], got.min_doc[0]) == lo
    assert (got.max_chars[0], got.max_doc[0]) == (-hi[0], hi[1])
