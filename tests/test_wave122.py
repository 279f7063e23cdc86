"""Brute twin for wave 122: k-anonymity risk census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kanon_risk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang", "n_chars"])
    exp = []
    for w in q.KANON_WIDTHS:
        cells = docs.assign(nb=docs.n_chars // w).groupby(
            ["source", "lang", "nb"]).size()
        for k in q.KANON_KS:
            below = cells[cells < k]
            exp.append((w, k, len(below), int(below.sum())))

    got = q.q_kanon_risk(SF).to_pandas()
    assert [(int(r.width), int(r.k), int(r.n_cells_below),
             int(r.n_docs_below)) for _, r in got.iterrows()] == exp
    # monotonicity: risk grows with k, and the generalization step
    # (wider buckets) never increases the below-k doc count at fixed k
    g = got.set_index(["width", "k"]).n_docs_below
    for w in q.KANON_WIDTHS:
        vals = [g[(w, k)] for k in q.KANON_KS]
        assert vals == sorted(vals)
    for k in q.KANON_KS:
        assert g[(1024, k)] <= g[(256, k)]
