"""Brute twin for wave 115: cross-split near-dup leakage audit."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_split_leakage_vs_brute(ray_session):
    from combblas_ray.functions import dedup as D
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q

    pairs = D.jaccard_pairs(q._docs(SF), tau=0.5).to_pandas()

    def code(i):
        h = md5_lower64(str(int(i))) % 10
        return 0 if h < q.SPLIT_TRAIN else (
            1 if h < q.SPLIT_TRAIN + q.SPLIT_VAL else 2)

    exp = {}
    for _, r in pairs.iterrows():
        ca, cb = code(r.a), code(r.b)
        k = (q._SPLIT_NAMES[min(ca, cb)], q._SPLIT_NAMES[max(ca, cb)])
        exp[k] = exp.get(k, 0) + 1

    got = q.q_split_leakage(SF).to_pandas()
    assert {(r.split_a, r.split_b): int(r.pairs)
            for _, r in got.iterrows()} == exp
    # the census partitions the verified pair set exactly
    assert int(got.pairs.sum()) == len(pairs)
