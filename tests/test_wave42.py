"""Brute twins for wave 42: part growth, bounce rate, audio energy
histogram, P3 census, blob collisions."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_part_growth_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_part_growth(SF).to_pandas()
    li, orders = _pq("lineitem"), _pq("orders")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["m"] = j.o_orderdate.dt.to_period("M")
    first = j.groupby("l_partkey").m.min()
    cnt = Counter(first)
    months = sorted(cnt)
    cum = 0
    for (y, mo, n, c), m in zip(
            zip(got.o_year, got.o_month, got.new_parts, got.cum_parts),
            months):
        cum += cnt[m]
        assert (y, mo) == (m.year, m.month)
        assert n == cnt[m]
        assert c == cum


def test_bounce_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_bounce_stats(SF).to_pandas()
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    gap = q.SESSION_GAP_MIN * 60_000_000
    ns = nb = 0
    for uid, g in ev.groupby("user_id"):
        t = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        new = np.concatenate(([True], np.diff(t) > gap))
        sizes = np.bincount(np.cumsum(new))[1:]
        ns += len(sizes)
        nb += int((sizes == 1).sum())
    assert got.n_sessions[0] == ns
    assert got.n_bounce[0] == nb


def test_audio_energy_hist_vs_brute(ray_session):
    from combblas_ray.functions import multimodal as M
    from combblas_ray.pipelines import queries as q

    got = q.q_audio_energy_hist(SF).to_pandas().set_index("band")
    docs = _pq("documents")
    cnt = Counter()
    for did in docs.doc_id:
        n = 256 + (did % 4) * 128
        pcm = ((np.arange(n) * (did + 11)) % M.AUDIO_MOD - 2000
               ).astype(np.int64)
        cnt[int((pcm * pcm).sum()) >> q.AEH_SHIFT] += 1
    assert dict(zip(got.index, got.cnt)) == dict(cnt)


def test_p3_count_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_p3_count(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    ue = {(min(s, d), max(s, d)) for s, d in zip(e.src, e.dst)
          if s != d}
    nbrs = {}
    for a, b in ue:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    ms = sum((len(nbrs[a]) - 1) * (len(nbrs[b]) - 1) for a, b in ue)
    tri = sum(1 for a, b in ue for c in nbrs[b]
              if c > b and c in nbrs[a])
    assert got.middle_sum[0] == ms
    assert got.triangles[0] == tri
    assert got.p3_paths[0] == ms - 3 * tri


def test_blob_collisions_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_blob_collisions(SF).to_pandas()
    docs = _pq("documents")
    cnt = Counter()
    for did in docs.doc_id:
        w = 8 + (did % 5) * 4
        h = 8 + (did % 3) * 4
        px = int(((np.arange(w * h) * (did + 7)) % 251).sum())
        cnt[(w, h, px)] += 1
    assert got.n_items[0] == len(docs)
    assert got.n_groups[0] == len(cnt)
    assert got.max_group[0] == max(cnt.values())
