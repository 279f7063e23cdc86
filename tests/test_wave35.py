"""Brute twins for wave 35: triad motifs, digit ratio, basket triples,
key gaps, per-user gap percentile."""

from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_motif_counts_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_motif_counts(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    out = {}
    for s, d in pairs:
        out.setdefault(s, []).append(d)
    ffl = cyc = 0
    for s, d in pairs:
        for d2 in out.get(d, ()):
            if (s, d2) in pairs:
                ffl += 1
            if (d2, s) in pairs:
                cyc += 1
    mutual = sum(1 for s, d in pairs if s < d and (d, s) in pairs)
    assert got.feed_forward[0] == ffl
    assert got.cycles3_walks[0] == cyc
    assert got.mutual_pairs[0] == mutual


def test_digit_ratio_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_digit_ratio(SF).to_pandas().set_index("source")
    docs = _pq("documents")
    for src, g in docs.groupby("source"):
        nt = nd = 0
        for t in g.text:
            for tok in t.split(" "):
                nt += 1
                if any(c.isdigit() for c in tok):
                    nd += 1
        assert got.loc[src, "n_tokens"] == nt
        assert got.loc[src, "n_digit"] == nd


def test_basket_triples_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_basket_triples(SF).to_pandas()
    li = _pq("lineitem")
    d = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    cnt = Counter()
    for ok, g in d.groupby("l_orderkey"):
        for tri in combinations(sorted(g.l_partkey), 3):
            cnt[tri] += 1
    rows = [(a, b, c, s) for (a, b, c), s in cnt.items()
            if s >= q.TRIPLE_MINSUP]
    rows.sort(key=lambda r: (-r[3], r[0], r[1], r[2]))
    want = rows[:q.TRIPLE_TOPK]
    assert list(zip(got.p1, got.p2, got.p3, got.support)) == want


def test_orderkey_gaps_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_orderkey_gaps(SF).to_pandas()
    keys = set(_pq("orders").o_orderkey)
    assert got.n_distinct[0] == len(keys)
    assert got.min_key[0] == min(keys)
    assert got.max_key[0] == max(keys)
    assert got.missing[0] == max(keys) - min(keys) + 1 - len(keys)


def test_user_gap_p95_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_user_gap_p95(SF).to_pandas().set_index("user_id")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        us = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        gaps = np.sort(np.diff(us))
        if not len(gaps):
            assert uid not in got.index
            continue
        rank = max(1, -(-q.GAPQ_P * len(gaps) // 100))
        assert got.loc[uid, "p95_gap_us"] == gaps[rank - 1]
