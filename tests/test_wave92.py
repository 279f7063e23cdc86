"""Brute twin for wave 92: integer-rational BM25 retrieval scoring."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_bm25_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    docs = {int(d): str(t).split(" ")
            for d, t in zip(tab.column("doc_id").to_pylist(),
                            tab.column("text").to_pylist())}
    n = len(docs)
    s_total = sum(len(t) for t in docs.values())
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    # query = top-qk tokens by (df desc, tok asc)
    qtoks = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:q.BM25_QK]
    scores = Counter()
    for d, toks in docs.items():
        tf = Counter(toks)
        dl = len(toks)
        for tok, dfv in qtoks:
            t = tf.get(tok, 0)
            if t == 0:
                continue
            idf_u = (n * 1_000) // dfv
            r_u = (22_000 * t * s_total) // (
                10 * s_total * t + 3 * s_total + 9 * dl * n)
            scores[d] += idf_u * r_u
    exp = sorted(((d, s) for d, s in scores.items() if s > 0),
                 key=lambda kv: (-kv[1], kv[0]))[:q.BM25_K]

    got = q.q_bm25_topk(SF).to_pandas()
    assert [(int(d), int(s)) for d, s in
            zip(got.doc_id, got.score_u)] == exp
    # the ranking is float-free: every score is a positive int64
    assert got.score_u.dtype == np.int64
    assert (got.score_u > 0).all()
