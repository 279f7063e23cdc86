"""Brute twin for wave 152: l-diversity census with Python dicts."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ldiversity_vs_dicts(ray_session):
    from combblas_ray.pipelines import queries as q

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    cell = (ev["ts"].astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000)
    groups = {}
    for c, et in zip(cell, ev["event_type"]):
        n, types = groups.get(int(c), (0, set()))
        types.add(et)
        groups[int(c)] = (n + 1, types)

    got = q.q_ldiversity(SF).to_pandas()
    for _, r in got.iterrows():
        l = int(r.l)
        below = [(n, t) for n, t in groups.values() if len(t) < l]
        assert int(r.n_cells_below) == len(below)
        assert int(r.n_events_below) == sum(n for n, _t in below)
    # monotone in l, and at least one singleton-type hour exists in
    # this synthetic stream (sparse hours)
    v = got.sort_values("l").n_cells_below.to_numpy()
    assert (np.diff(v) >= 0).all()
    assert v[-1] > 0
