"""Brute twins for wave 71: hub eccentricity/co-reach (K-source
aggregate faces), source-lang entropy, lag-delta census, order gaps."""

import math
from collections import deque

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _und_nbrs(ctx):
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    return nbrs


def _hubs_and_dists(q, ctx):
    nbrs = _und_nbrs(ctx)
    deg = np.zeros(ctx.n, dtype=np.int64)
    for v, ns in nbrs.items():
        deg[v] = len(ns)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    hubs = np.lexsort((ar, -deg))[: q.APSP_K]
    dists = {}
    for h in hubs:
        dist = {int(h): 0}
        dq = deque([int(h)])
        while dq:
            u = dq.popleft()
            if dist[u] >= q.BFS_ITERS:
                continue
            for v in nbrs.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        dists[int(h)] = dist
    return hubs, dists


def test_hub_ecc_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    hubs, dists = _hubs_and_dists(q, ctx)
    got = q.q_hub_ecc(SF).to_pandas()
    labels = {lb: (e, n) for lb, e, n in
              zip(got.label, got.ecc, got.n_reached)}
    for h in hubs:
        lb = str(np.asarray(ctx.gather_labels(np.array([h])))[0])
        d = dists[int(h)]
        assert labels[lb] == (max(d.values()), len(d)), lb


def test_hub_coreach_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    hubs, dists = _hubs_and_dists(q, ctx)
    reach_count = np.zeros(ctx.n, dtype=np.int64)
    for h in hubs:
        for v in dists[int(h)]:
            reach_count[v] += 1
    got = q.q_hub_coreach(SF).to_pandas().iloc[0]
    assert got.n_all == int((reach_count == len(hubs)).sum())
    assert got.n_any == int((reach_count > 0).sum())
    assert got.n_none == int((reach_count == 0).sum())


def test_source_lang_entropy_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = _pq("documents")
    got = q.q_source_lang_entropy(SF).to_pandas()
    per = docs.groupby(["source", "lang"]).size()
    for _, row in got.iterrows():
        c = per[row.source].to_numpy().astype(float)
        p = c / c.sum()
        assert row.n_docs == int(c.sum())
        assert abs(row.entropy - round(float(-(p * np.log(p)).sum()), 6)) \
            <= 1e-6, row.source


def test_user_value_lag_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    ev = _pq("events").sort_values(
        ["user_id", "event_type", "ts", "event_id"])
    got = q.q_user_value_lag(SF).to_pandas()
    sums: dict[str, list] = {}
    for (_, _), g in ev.groupby(["user_id", "event_type"]):
        v = g.value.to_numpy()
        if len(v) < 2:
            continue
        dv = np.abs(np.diff(v))
        a = sums.setdefault(g.event_type.iloc[0], [0.0, 0])
        a[0] += float(dv.sum())
        a[1] += len(dv)
    for _, row in got.iterrows():
        s, n = sums[row.event_type]
        assert row.n_pairs == n
        assert abs(row.mean_abs_dv - round(s / n, 6)) <= 1e-6
    assert set(got.event_type) == set(sums)


def test_order_gap_hist_vs_brute(ray_session):
    from collections import Counter

    from combblas_ray.pipelines import queries as q

    o = _pq("orders").sort_values(["o_custkey", "o_orderdate",
                                   "o_orderkey"])
    days = o.o_orderdate.astype("datetime64[us]").astype("int64") \
        // 86_400_000_000
    cnt: Counter = Counter()
    prev_c = prev_d = None
    for c, d in zip(o.o_custkey, days):
        if c == prev_c:
            cnt[int(d - prev_d)] += 1
        prev_c, prev_d = c, d
    got = q.q_order_gap_hist(SF).to_pandas()
    assert dict(zip(got.gap_days, got.n)) == dict(cnt)
