"""Brute twin for wave 113: largest-remainder training-mix plan."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_mix_allocation_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang"])
    cells = docs.groupby(["source", "lang"]).size().reset_index(
        name="docs")
    dc = cells.docs.to_numpy(dtype=np.int64)
    w = np.floor(np.sqrt(dc.astype(np.float64))).astype(np.int64)
    W = int(w.sum())
    B = q.ALLOC_BUDGET
    fl = (B * w) // W
    rem = (B * w) % W
    order = np.lexsort((cells.lang.to_numpy().astype(str),
                        cells.source.to_numpy().astype(str), -rem))
    alloc = fl.copy()
    alloc[order[: B - int(fl.sum())]] += 1
    exp = {(s, l): (int(d), int(a)) for s, l, d, a in zip(
        cells.source, cells.lang, dc, alloc)}

    got = q.q_mix_allocation(SF).to_pandas()
    assert len(got) == len(cells)
    for _, r in got.iterrows():
        d, a = exp[(r.source, r.lang)]
        assert int(r.docs) == d and int(r.alloc) == a
    # apportionment invariants: the budget is spent exactly, and no
    # cell deviates from its floor share by more than one slot
    assert int(got.alloc.sum()) == B
    w2 = np.floor(np.sqrt(got.docs.to_numpy(dtype=np.float64)))
    fl2 = (B * w2.astype(np.int64)) // int(w2.sum())
    assert ((got.alloc.to_numpy() - fl2) <= 1).all()
    assert ((got.alloc.to_numpy() - fl2) >= 0).all()
