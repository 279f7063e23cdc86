"""Brute twin for wave 129: dedup-discounted effective token budget."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_effective_tokens_vs_brute(ray_session):
    from combblas_ray.functions import dedup as D
    from combblas_ray.pipelines import queries as q

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    cl = D.dup_clusters(q._docs(SF), tau=0.5,
                        rounds=q.DUP_CLUSTER_ROUNDS).to_pandas()
    sz = cl.groupby("cluster").size().rename("sz")
    cl = cl.join(sz, on="cluster").set_index("doc_id").sz
    exp_raw: dict[str, int] = {}
    exp_eff: dict[str, float] = {}
    for _, r in docs.iterrows():
        s = int(cl.get(r.doc_id, 1))
        exp_raw[r.source] = exp_raw.get(r.source, 0) + int(r.n_chars)
        exp_eff[r.source] = exp_eff.get(r.source, 0.0) + r.n_chars / s

    got = q.q_effective_tokens(SF).to_pandas()
    assert sorted(got.source) == sorted(exp_raw)
    for _, r in got.iterrows():
        assert int(r.raw_chars) == exp_raw[r.source]
        assert abs(r.effective_chars - exp_eff[r.source]) < 1e-3
    # discounting can only shrink, and shrinks strictly where dups exist
    assert (got.effective_chars <= got.raw_chars + 1e-9).all()
    if (cl > 1).any():
        assert (got.effective_chars < got.raw_chars).any()
