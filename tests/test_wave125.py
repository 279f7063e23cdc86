"""Brute twin for wave 125: multi-touch attribution."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_attribution_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    last_c: dict[str, int] = {}
    first_c: dict[str, int] = {}
    for _u, g in ev.groupby("user_id"):
        touches: list[str] = []
        for _, r in g.iterrows():
            if r.event_type == "purchase":
                if touches:
                    last_c[touches[-1]] = last_c.get(touches[-1], 0) + 1
                    first_c[touches[0]] = first_c.get(touches[0], 0) + 1
                touches = []
            else:
                touches.append(r.event_type)

    got = q.q_attribution(SF).to_pandas()
    exp_types = sorted(set(last_c) | set(first_c))
    assert list(got.event_type) == exp_types
    for _, r in got.iterrows():
        assert int(r.last_touch) == last_c.get(r.event_type, 0)
        assert int(r.first_touch) == first_c.get(r.event_type, 0)
    # both models hand out exactly one credit per attributable purchase
    assert int(got.last_touch.sum()) == int(got.first_touch.sum())
