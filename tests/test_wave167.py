"""Brute twin for wave 167: policy regex scan via Python `re`."""

import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_policy_scan_vs_python_re(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "lang"]).to_pandas()
    exp = {}
    for i, p in enumerate(q.POLICY_PATTERNS):
        rx = re.compile(p)
        for _, r in docs.iterrows():
            if rx.search(r.text):
                exp[(i, r.lang)] = exp.get((i, r.lang), 0) + 1

    got = q.q_policy_scan(SF).to_pandas()
    assert {(int(r.pattern_id), r.lang): int(r.n_docs)
            for _, r in got.iterrows()} == exp
    # every pattern fires somewhere on this corpus
    assert {int(r.pattern_id) for _, r in got.iterrows()} == \
        set(range(len(q.POLICY_PATTERNS)))
