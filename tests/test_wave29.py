"""Brute twins for wave 29: DAG layering, out-of-order audit, degree
joint histogram, pixel histogram, multiset except."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_dag_layers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_dag_layers(SF).to_pandas().set_index("label")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    dag = sorted({(s, d) for s, d in zip(e.src, e.dst) if s < d})
    n = ctx.n
    layer = np.zeros(n, dtype=np.int64)
    # src < dst: one ascending pass per round; 12 truncated rounds
    for _ in range(12):
        new = layer.copy()
        for s, d in dag:
            new[d] = max(new[d], layer[s] + 1)
        if np.array_equal(new, layer):
            break
        layer = new
    labels = np.asarray(ctx.labels)
    assert dict(zip(got.index, got.layer)) == {
        labels[i]: int(layer[i]) for i in range(n)}


def test_ooo_events_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_ooo_events(SF).to_pandas().set_index("user_id")
    ev = _pq("events").sort_values(["user_id", "event_id"])
    for uid, g in ev.groupby("user_id"):
        us = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        pm = np.maximum.accumulate(us)
        skew = np.concatenate(([0], pm[:-1] - us[1:]))
        late = skew > 0
        assert got.loc[uid, "n_late"] == late.sum()
        assert got.loc[uid, "max_skew_us"] == (
            skew[late].max() if late.any() else 0)


def test_deg_joint_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_deg_joint_hist(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    od = Counter(s for s, _ in pairs)
    idg = Counter(d for _, d in pairs)
    cnt = Counter((od.get(v, 0), idg.get(v, 0)) for v in range(ctx.n))
    assert {(a, b): c for a, b, c in
            zip(got.outdeg, got.indeg, got.cnt)} == dict(cnt)


def test_pixel_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_pixel_hist(SF).to_pandas().set_index("pixel")
    docs = _pq("documents")
    h = np.zeros(256, dtype=np.int64)
    for did in docs.doc_id:
        w = 8 + (did % 5) * 4
        hh = 8 + (did % 3) * 4
        pix = (np.arange(w * hh) * (did + 7)) % 251
        h += np.bincount(pix, minlength=256)
    nz = np.nonzero(h)[0]
    assert dict(zip(got.index, got.cnt)) == {
        int(p): int(h[p]) for p in nz}


def test_token_except_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_token_except(SF).to_pandas().set_index("tok")
    docs = _pq("documents")
    ca, cb = Counter(), Counter()
    for lang, text in zip(docs.lang, docs.text):
        if lang == q.TE_LANG_A:
            ca.update(text.split(" "))
        elif lang == q.TE_LANG_B:
            cb.update(text.split(" "))
    want = {t: ca[t] - cb.get(t, 0) for t in ca
            if ca[t] > cb.get(t, 0)}
    assert dict(zip(got.index, got.excess)) == want
