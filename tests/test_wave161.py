"""Brute twin for wave 161: max-min fair water-filling — simulate the
textbook iterative algorithm (repeatedly satisfy the smallest demand or
split the rest) instead of the closed form."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_fair_share_vs_iterative_waterfill(ray_session):
    from combblas_ray.pipelines import queries as q

    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["source"]).column("source").to_pylist()
    dem = {}
    for s in src:
        dem[s] = dem.get(s, 0) + 1
    order = sorted(dem, key=lambda s: (dem[s], s))
    C = (q.FAIR_NUM * sum(dem.values())) // q.FAIR_DEN

    alloc = {}
    remaining = list(order)
    cap = C
    while remaining:
        m = len(remaining)
        level = cap // m
        smallest = remaining[0]
        if dem[smallest] <= level:
            alloc[smallest] = dem[smallest]
            cap -= dem[smallest]
            remaining.pop(0)
        else:
            r = cap % m
            for i, s in enumerate(remaining):
                alloc[s] = level + (1 if i < r else 0)
            remaining = []

    got = q.q_fair_share(SF).to_pandas()
    assert {r.source: (int(r.demand), int(r.alloc))
            for _, r in got.iterrows()} == \
        {s: (dem[s], alloc[s]) for s in dem}
    # capacity fully used, nobody over-allocated
    assert int(got.alloc.sum()) == C
    assert (got.alloc <= got.demand).all()
    # max-min property: any source below its demand gets >= any other
    # source's allocation minus 1 (the integer water level)
    starved = got[got.alloc < got.demand]
    if len(starved):
        assert int(starved.alloc.min()) >= int(got.alloc.max()) - 1
