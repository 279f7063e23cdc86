"""Brute twins for wave 23: co-citation, similarity histogram,
transitions, MAD, degree quantiles."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_cocitation_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_cocitation_topk(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    labels = np.asarray(ctx.labels)
    ins = {}
    for s, d in set(zip(e.src, e.dst)):
        ins.setdefault(s, []).append(d)
    cnt = Counter()
    for s, ds in ins.items():
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                cnt[(ds[x], ds[y])] += 1
    rows = [(labels[a], labels[b], c) for (a, b), c in cnt.items()
            if c >= q.COCIT_MIN]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    want = rows[:q.COCIT_TOPK]
    assert list(zip(got.a, got.b, got.cnt)) == want


def test_sim_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_sim_hist(SF).to_pandas().set_index("bucket")
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.SIMH_N].sort_values("vec_id")
    Q = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                           * (1 << 20)).astype(np.int64)
                  for e in emb.embedding])
    d = Q @ Q.T
    iu = np.triu_indices(len(Q), k=1)
    b = d[iu] >> q.SIMH_SHIFT
    ub, cnt = np.unique(b, return_counts=True)
    assert dict(zip(got.index, got.cnt)) == dict(
        zip(ub.tolist(), cnt.tolist()))


def test_transition_counts_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_transition_counts(SF).to_pandas()
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    cnt = Counter()
    for uid, g in ev.groupby("user_id"):
        ts = g.event_type.tolist()
        for a, b in zip(ts, ts[1:]):
            cnt[(a, b)] += 1
    assert {(a, b): c for a, b, c in
            zip(got.from_type, got.to_type, got.cnt)} == dict(cnt)


def test_events_mad_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_events_mad(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "c": cents})
    for et, g in df.groupby("t"):
        v = np.sort(g.c.to_numpy())
        med = v[(len(v) - 1) // 2]
        d = np.sort(np.abs(v - med))
        assert got.loc[et, "med_cents"] == med
        assert got.loc[et, "mad_cents"] == d[(len(d) - 1) // 2]


def test_degree_quantiles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_degree_quantiles(SF).to_pandas().set_index("p")
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    deg = Counter(s for s, d in set(zip(e.src, e.dst)))
    v = np.sort(np.array(list(deg.values())))
    for p in q.DEGQ:
        rank = max(1, -(-p * len(v) // 100))
        assert got.loc[p, "degree"] == v[rank - 1]
