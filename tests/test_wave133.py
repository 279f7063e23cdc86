"""Brute twin for wave 133: ANN recall agreement audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ann_recall_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    mat = np.stack([np.asarray(e, dtype=np.float64)
                    for e in emb.embedding])
    ids = emb.vec_id.to_numpy(dtype=np.int64)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    exact = {}
    for qv in range(10):
        qi = order[ids[order] == qv][0]
        sims = nm @ nm[qi]
        cand = [(float(-sims[j]), int(ids[j])) for j in range(len(ids))
                if ids[j] != qv]
        cand.sort()
        exact[qv] = {c[1] for c in cand[:5]}

    got = q.q_ann_recall_audit(SF).to_pandas()
    # the audit histogram totals the 10 queries and hits <= k
    assert int(got.n_queries.sum()) == 10
    assert int(got.hits.max()) <= 5
    # the multi-probe plan must agree far above chance (random top-5
    # of ~500 vectors would average ~0.05 hits)
    mean_hits = float((got.hits * got.n_queries).sum()) / 10.0
    assert mean_hits >= 1.0
    # cross-check the exact side against numpy brute: recompute the
    # audit with the pipeline's own LSH output and the numpy exact set
    from combblas_ray.functions import ann as A

    import ray
    embds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                  columns=["vec_id", "embedding"])
    ls = A.ann_lsh_topk(embds, np.arange(10), k=5).to_pandas()
    agg = {}
    for qv in range(10):
        nbrs = {int(r.neighbor_id) for _, r in ls.iterrows()
                if int(r.query_id) == qv}
        h = len(nbrs & exact[qv])
        agg[h] = agg.get(h, 0) + 1
    assert {int(r.hits): int(r.n_queries)
            for _, r in got.iterrows()} == agg
