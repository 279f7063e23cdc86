"""Brute twin for wave 137: greedy max-coverage selection."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_coverage_greedy_vs_brute(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    by_doc: dict[int, set] = {}
    for _, r in docs.iterrows():
        t = r.text.split(" ")
        sh = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
        by_doc[int(r.doc_id)] = {
            md5_lower64(s) % (1 << 63) for s in sh}
    covered: set = set()
    chosen = []
    avail = dict(by_doc)
    for r in range(1, q.COVER_K + 1):
        gains = {d: len(s - covered) for d, s in avail.items()}
        pick = min(gains, key=lambda d: (-gains[d], d))
        g = gains[pick]
        covered |= avail.pop(pick)
        chosen.append((r, pick, g, len(covered)))

    got = q.q_coverage_greedy(SF).to_pandas().sort_values("round")
    assert [(int(r["round"]), int(r.doc_id), int(r.gain),
             int(r.covered_total)) for _, r in got.iterrows()] == chosen
    # submodularity: marginal gains are non-increasing
    assert list(got.gain) == sorted(got.gain, reverse=True)
