"""Brute twin for wave 139: LRU cache audit via stack distances.

The query computes hits from Mattson stack distances; this twin SIMULATES
an actual LRU cache per capacity (move-to-front list) — agreement proves
the inclusion-property shortcut, not just the arithmetic.
"""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lru_audit_vs_cache_simulation(ray_session):
    from combblas_ray.pipelines import queries as q

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])

    exp = {}
    for uid, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for cap in q.LRU_CAPS:
            cache: list = []  # front = most recently used
            hits = 0
            for x in types:
                if x in cache:
                    hits += 1
                    cache.remove(x)
                else:
                    if len(cache) >= cap:
                        cache.pop()
                cache.insert(0, x)
            exp[(int(uid), cap)] = (hits, len(types))

    got = q.q_lru_audit(SF).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        h, a = exp[(int(r.user_id), int(r.capacity))]
        assert (int(r.hits), int(r.accesses)) == (h, a), r
    # sanity: monotone in capacity, and some user actually hits
    p = got.pivot(index="user_id", columns="capacity", values="hits")
    assert (p[2] <= p[4]).all() and (p[4] <= p[8]).all()
    assert int(got.hits.sum()) > 0
