"""Brute twins for wave 34: knn curve, systematic sample, peel trace,
n_chars audit, dominant-dim histogram."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_knn_curve_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_knn_curve(SF).to_pandas().set_index("d")
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    od = Counter(s for s, _ in pairs)
    per_d = {}
    for s, t in pairs:
        d = od[s]
        e2 = per_d.setdefault(d, [0, 0])
        e2[0] += od.get(t, 0)
        e2[1] += 1
    nv = Counter(od.values())
    for d, (nds, ne) in per_d.items():
        assert got.loc[d, "n_vertices"] == nv[d]
        assert got.loc[d, "n_edges"] == ne
        assert got.loc[d, "nbr_deg_sum"] == nds


def test_systematic_sample_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_systematic_sample(SF).to_pandas().sort_values(
        "rank").reset_index(drop=True)
    docs = _pq("documents").sort_values(["n_chars", "doc_id"])
    want = docs.doc_id.tolist()[::q.SYS_STEP]
    assert got.doc_id.tolist() == want
    assert got["rank"].tolist() == list(
        range(0, len(docs), q.SYS_STEP))


def test_peel_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_peel_trace(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    ue = {(min(s, d), max(s, d)) for s, d in zip(e.src, e.dst)
          if s != d}
    alive = set(range(ctx.n))
    rows = []
    for _ in range(q.PEEL_ROUNDS):
        deg = Counter()
        for a, b in ue:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        kill = {v for v in alive if deg.get(v, 0) < q.PEEL_K}
        rows.append((len(kill), len(alive) - len(kill)))
        if not kill:
            break
        alive -= kill
    assert got.removed.tolist() == [r[0] for r in rows]
    assert got.surviving.tolist() == [r[1] for r in rows]


def test_nchars_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_nchars_audit(SF).to_pandas()
    docs = _pq("documents")
    diff = np.array([abs(len(t) - n)
                     for t, n in zip(docs.text, docs.n_chars)])
    assert got.n_match[0] == int((diff == 0).sum())
    assert got.n_mismatch[0] == int((diff != 0).sum())
    assert got.max_abs_diff[0] == int(diff.max())


def test_dominant_dim_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_dominant_dim_hist(SF).to_pandas().set_index("dim")
    emb = _pq("embeddings")
    mat = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                             * (1 << 20)).astype(np.int64)
                    for e in emb.embedding])
    cnt = Counter(mat.argmax(axis=1).tolist())
    assert dict(zip(got.index, got.cnt)) == dict(cnt)
