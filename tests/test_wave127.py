"""Brute twin for wave 127: top-p mass data selection."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_topp_selection_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    exp = {}
    for lang, g in docs.groupby("lang"):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True])
        tot = int(g.n_chars.sum())
        before = 0
        kept = 0
        for nc in g.n_chars:
            if q.TOPP_DEN * before < q.TOPP_NUM * tot:
                kept += 1
            before += int(nc)
        exp[lang] = (len(g), tot, kept)

    got = q.q_topp_selection(SF)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, tot, kept = exp[r.lang]
        assert (int(r.n_docs), int(r.char_mass), int(r.kept)) \
            == (n, tot, kept)
        # the cut keeps at most all docs and at least one
        assert 1 <= kept <= n
