"""Brute twin for wave 151: ordinal-pattern census — Python-int daily
series, explicit (value, position) sort per window."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ordinal_patterns_vs_sorting(ray_session):
    from collections import Counter

    from combblas_ray.pipelines import queries as q

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["day"] = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    exp = Counter()
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index().to_numpy()
        for i in range(len(daily) - 2):
            w = daily[i:i + 3]
            keys = sorted((int(w[j]), j) for j in range(3))
            rank = {pos: r for r, (_v, pos) in enumerate(keys)}
            pat = 100 * rank[0] + 10 * rank[1] + rank[2]
            exp[(et, pat)] += 1

    got = q.q_ordinal_patterns(SF).to_pandas()
    assert {(r.event_type, int(r.pattern)): int(r.cnt)
            for _, r in got.iterrows()} == dict(exp)
    # every pattern id is a valid permutation of {0,1,2}
    for _, r in got.iterrows():
        digs = sorted((int(r.pattern) // 100, (int(r.pattern) // 10) % 10,
                       int(r.pattern) % 10))
        assert digs == [0, 1, 2]
