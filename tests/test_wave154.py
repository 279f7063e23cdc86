"""Brute twins for waves 154-155: LCP census + randomized response."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lcp_census_vs_python_strings(ray_session):
    from combblas_ray.pipelines import queries as q

    texts = sorted(pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    ).column("text").to_pylist())
    agg = {}
    for a, b in zip(texts[:-1], texts[1:]):
        l = 0
        for ca, cb in zip(a[:q.LCP_CAP], b[:q.LCP_CAP]):
            if ca != cb:
                break
            l += 1
        bk = l // q.LCP_BUCKET
        agg[bk] = agg.get(bk, 0) + 1

    got = q.q_lcp_census(SF).to_pandas()
    assert {int(r.bucket): int(r.n_pairs)
            for _, r in got.iterrows()} == agg
    assert int(got.n_pairs.sum()) == len(texts) - 1


def test_rr_histogram_vs_python_ints(ray_session):
    from combblas_ray.pipelines import queries as q

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type"]).to_pandas()
    types = sorted(set(ev["event_type"]))
    K = len(types)
    idx = {t: i for i, t in enumerate(types)}
    true_c = {t: 0 for t in types}
    noisy_c = {t: 0 for t in types}
    for eid, et in zip(ev["event_id"], ev["event_type"]):
        true_c[et] += 1
        h = (int(eid) * 2654435761) % 1_000_003
        rep = et if h % q.RR_COIN_MOD != 0 else types[(h // 3) % K]
        noisy_c[rep] += 1
    N = len(ev)

    got = q.q_rr_histogram(SF).to_pandas()
    assert len(got) == K
    for _, r in got.iterrows():
        assert int(r.true_cnt) == true_c[r.event_type]
        assert int(r.noisy_cnt) == noisy_c[r.event_type]
        assert int(r.est_num6k) == 9 * K * noisy_c[r.event_type] - 3 * N
    # exact invariant: the debiased estimates conserve total mass
    # (sum over types of est*6K == 6*K*N), so the estimator is a
    # proper redistribution, not a scale drift
    assert int(got.est_num6k.sum()) == 6 * K * N
    assert int(got.noisy_cnt.sum()) == N
