"""Brute twins for wave 37: dataset split, wedge-sample estimator,
path uniqueness, referential integrity, lag-2 matches."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_data_split_vs_brute(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q

    got = q.q_data_split(SF).to_pandas().set_index("split")
    docs = _pq("documents")
    agg = {"train": [0, 0], "val": [0, 0], "test": [0, 0]}
    for did in docs.doc_id:
        h = md5_lower64(str(int(did))) % 10
        s = ("train" if h < q.SPLIT_TRAIN
             else "val" if h < q.SPLIT_TRAIN + q.SPLIT_VAL else "test")
        agg[s][0] += 1
        agg[s][1] += did
    for s, (n, t) in agg.items():
        if n:
            assert got.loc[s, "n_docs"] == n
            assert got.loc[s, "id_sum"] == t


def test_wedge_sample_est_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_wedge_sample_est(SF).to_pandas()
    ctx = get_context(SF)
    n = ctx.n
    e = ctx.edges.to_pandas()
    und = set()
    for s, d in zip(e.src, e.dst):
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs = {}
    for m, x in und:
        nbrs.setdefault(m, []).append(x)
    ue = {(min(a, b), max(a, b)) for a, b in und}
    total = sampled = closed = 0
    for m, xs in nbrs.items():
        xs = sorted(set(xs))
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                a, c = xs[i], xs[j]
                total += 1
                key = (a * n + c) % (1 << 31)
                if (key * 48271 + m) % q.WEDGE_SAMPLE_MOD == 0:
                    sampled += 1
                    if (a, c) in ue:
                        closed += 1
    assert got.total_wedges[0] == total
    assert got.sampled[0] == sampled
    assert got.closed[0] == closed


def test_path_unique_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as C

    got = q.q_path_unique_audit(SF).to_pandas()
    n = C.n_files_for(SF)
    df = C.corpus_batch(np.arange(n), n).to_pandas()
    cnt = Counter(zip(df.repo, df.path))
    assert got.n_rows[0] == n
    assert got.n_distinct[0] == len(cnt)
    assert got.max_dup[0] == max(cnt.values())


def test_ref_integrity_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_ref_integrity(SF).to_pandas()
    d = set(_pq("documents").doc_id)
    v = set(_pq("embeddings").vec_id)
    assert got.matched[0] == len(d & v)
    assert got.docs_only[0] == len(d - v)
    assert got.vecs_only[0] == len(v - d)


def test_lag2_match_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lag2_match(SF).to_pandas().set_index("event_type")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    pairs, match = Counter(), Counter()
    for uid, g in ev.groupby("user_id"):
        ts = g.event_type.tolist()
        for a, b in zip(ts, ts[2:]):
            pairs[a] += 1
            if a == b:
                match[a] += 1
    for et in pairs:
        assert got.loc[et, "n_pairs"] == pairs[et]
        assert got.loc[et, "n_match"] == match.get(et, 0)
