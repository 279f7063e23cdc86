"""Brute twin for wave 169: D2 similarity with Python Counters."""

from collections import Counter
from itertools import combinations

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_d2_similarity_vs_counters(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "lang"]).to_pandas()
    spec = {}
    for _, r in docs.iterrows():
        w = r.text.split(" ")
        spec.setdefault(r.lang, Counter()).update(
            f"{a} {b}" for a, b in zip(w[:-1], w[1:]))

    exp = {}
    for la, lb in combinations(sorted(spec), 2):
        d2 = sum(c * spec[lb][g] for g, c in spec[la].items())
        exp[(la, lb)] = d2

    got = q.q_d2_similarity(SF).to_pandas()
    assert {(r.lang_a, r.lang_b): int(r.d2)
            for _, r in got.iterrows()} == exp
    # shared-vocabulary corpora: every pair overlaps somewhere
    assert all(v > 0 for v in exp.values())
