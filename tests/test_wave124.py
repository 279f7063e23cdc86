"""Brute twin for wave 124: content-defined chunking census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cdc_chunks_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    w, b, mask = q.CDC_W, q.CDC_B, q.CDC_MASK
    agg: dict[int, int] = {}
    for t in docs.text:
        bt = t.encode()
        cuts = 0
        for i in range(w - 1, len(bt)):
            h = sum(bt[i - j] * (b ** j) for j in range(w))
            if h % mask == 0:
                cuts += 1
        agg[cuts + 1] = agg.get(cuts + 1, 0) + 1

    got = q.q_cdc_chunks(SF).to_pandas()
    assert {int(r.n_chunks): int(r.n_docs)
            for _, r in got.iterrows()} == agg
    assert int(got.n_docs.sum()) == len(docs)


def test_cdc_boundaries_survive_insertion():
    """The CDC property itself: inserting a byte near the front only
    moves cuts inside one window of the edit — downstream cutpoints
    are unchanged (the reason CDC beats fixed-size chunking for
    dedup)."""
    from combblas_ray.pipelines import queries as q

    w, b, mask = q.CDC_W, q.CDC_B, q.CDC_MASK

    def cutpos(bt):
        out = []
        for i in range(w - 1, len(bt)):
            h = sum(bt[i - j] * (b ** j) for j in range(w))
            if h % mask == 0:
                out.append(i)
        return out

    rng = np.random.RandomState(7)
    base = bytes(rng.randint(32, 127, 400, dtype=np.uint8).tolist())
    edited = base[:5] + b"X" if False else base[:5] + bytes([88]) + base[5:]
    c0 = cutpos(base)
    c1 = cutpos(edited)
    # every cut of the original past the edit window reappears shifted
    # by exactly one byte
    tail0 = [p for p in c0 if p >= 5 + w]
    tail1 = [p - 1 for p in c1 if p - 1 >= 5 + w]
    assert tail0 == tail1
