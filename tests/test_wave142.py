"""Brute twin for wave 142: secretary-rule stopping audit — a plain
per-user Python simulation of the observe-then-leap policy."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_stopping_audit_vs_simulation(ray_session):
    from combblas_ray.pipelines import queries as q

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).to_pandas().sort_values(["user_id", "ts", "event_id"])

    exp = {}
    for uid, grp in ev.groupby("user_id"):
        vals = grp["value"].to_numpy()
        eids = grp["event_id"].to_numpy()
        m = len(vals)
        k = m // 3
        pmax = vals[:k].max() if k else -np.inf
        pick = m - 1  # forced: last
        for i in range(k, m):
            if vals[i] > pmax:
                pick = i
                break
        exp[int(uid)] = (m, int(eids[pick]), float(vals[pick]),
                         int(vals[pick] == vals.max()))

    got = q.q_stopping_audit(SF).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        m, pe, pv, s = exp[int(r.user_id)]
        assert (int(r.m), int(r.picked_event_id)) == (m, pe)
        assert r.picked_value == pv and int(r.success) == s
    # the 1/3 rule should win for a decent share of users (~1/e theory)
    assert int(got.success.sum()) >= len(got) // 6
