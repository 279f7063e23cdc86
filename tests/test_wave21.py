"""Brute twins for wave 21: PQ codes, KWIC, running distinct, GF(2)
parity reach, triangle strength."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _quant(v):
    return np.floor((np.asarray(v, dtype=np.float64) + 0.5)
                    * (1 << 20)).astype(np.int64)


def test_pq_codes_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_pq_codes(SF).to_pandas()
    emb = _pq("embeddings").sort_values("vec_id")
    mat = np.stack([_quant(e) for e in emb.embedding])
    ids = emb.vec_id.to_numpy()
    C = mat[ids < q.PQ_NSEED][np.argsort(ids[ids < q.PQ_NSEED])]
    d = mat.shape[1] // q.PQ_SUB
    want = {}
    for vid, row in zip(ids, mat):
        for s in range(q.PQ_SUB):
            seg = row[s * d:(s + 1) * d]
            d2 = ((C[:, s * d:(s + 1) * d] - seg) ** 2).sum(axis=1)
            want[(vid, s)] = int(np.argmin(d2))
    got_d = {(v, s): c for v, s, c in zip(got.vec_id, got.s, got.code)}
    assert got_d == want


def test_kwic_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_kwic(SF).to_pandas().set_index("doc_id")
    docs = _pq("documents")
    want = {}
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        if q.POS_TOKEN in toks:
            i = toks.index(q.POS_TOKEN)
            want[did] = " ".join(toks[max(i - 1, 0):i + 2])
    assert dict(zip(got.index, got.ctx3)) == want


def test_running_distinct_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_running_distinct(SF).to_pandas().set_index("event_id")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, g in ev.groupby("user_id"):
        seen = set()
        for eid, et in zip(g.event_id, g.event_type):
            seen.add(et)
            want[eid] = len(seen)
    assert dict(zip(got.index, got.run_distinct)) == want


def test_reach2_parity_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_reach2_parity(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    out = [[] for _ in range(ctx.n)]
    for s, d in pairs:
        out[s].append(d)
    cnt = Counter()
    for s, d in pairs:
        for d2 in out[d]:
            cnt[(s, d2)] += 1
    labels = np.asarray(ctx.labels)
    want = {(labels[a], labels[b]) for (a, b), c in cnt.items()
            if c % 2 == 1}
    assert set(zip(got.src_label, got.dst_label)) == want


def test_triangle_strength_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_triangle_strength(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    uw = {}
    for s, d, w in zip(e.src, e.dst, e.w):
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        uw[k] = uw.get(k, 0) + int(w)
    adj = {}
    for (a, b) in uw:
        adj.setdefault(a, set()).add(b)
    nt = st = 0
    for (a, b), wab in uw.items():
        for c in adj.get(b, ()):  # b < c by construction
            if c in adj.get(a, ()):
                nt += 1
                st += min(wab, uw[(b, c)], uw[(a, c)])
    assert got.n_triangles[0] == nt
    assert got.strength[0] == st
