"""Brute twins for wave 30: configuration-model stats, curation
funnel, dup-cluster sizes, similarity by label."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_config_model_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_config_model_stats(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    od = Counter(s for s, _ in pairs)
    idg = Counter(d for _, d in pairs)
    assert got.m[0] == len(pairs)
    assert got.sum_dout_din[0] == sum(od[s] * idg[d] for s, d in pairs)
    assert got.sum_dout2[0] == sum(v * v for v in od.values())
    assert got.sum_din2[0] == sum(v * v for v in idg.values())


def test_filter_funnel_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_filter_funnel(SF).to_pandas()
    docs = _pq("documents")
    s = [len(docs), 0, 0, 0]
    for _, r in docs.iterrows():
        if r.n_chars < q.FF_MIN_CHARS:
            continue
        s[1] += 1
        toks = r.text.split(" ")
        if len(set(toks)) * q.FF_DR_DEN < len(toks) * q.FF_DR_NUM:
            continue
        s[2] += 1
        if r.lang != "zh":
            s[3] += 1
    assert got.survivors.tolist() == s


def test_dup_size_hist_consistent_with_clusters(ray_session):
    from combblas_ray.pipelines import queries as q

    hist = q.q_dup_size_hist(SF).to_pandas()
    cl = q.q_dup_clusters(SF).to_pandas()
    sizes = Counter(Counter(cl.cluster).values())
    assert dict(zip(hist["size"], hist.n_clusters)) == dict(sizes)


def test_sim_by_label_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_sim_by_label(SF).to_pandas().set_index("same_label")
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.SIML_N].sort_values("vec_id")
    Q = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                           * (1 << 20)).astype(np.int64)
                  for e in emb.embedding])
    lab = emb.label.to_numpy()
    d = Q @ Q.T
    iu, ju = np.triu_indices(len(Q), k=1)
    same = lab[iu] == lab[ju]
    for flag in (0, 1):
        m = same == bool(flag)
        assert got.loc[flag, "n_pairs"] == m.sum()
        assert got.loc[flag, "sum_dot"] == d[iu[m], ju[m]].sum()
