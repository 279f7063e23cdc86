"""Brute twin for wave 162: keep-best dedup canonicalization — union-
find over brute-force Jaccard pairs, then an explicit per-cluster
argmax (no fixed-round min-label)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _shingles(t: str, k: int = 3):
    w = t.split(" ")
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def test_dedup_canonical_vs_union_find(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "n_chars"]).to_pandas()
    sh = {int(r.doc_id): _shingles(r.text) for _, r in docs.iterrows()}
    ln = {int(r.doc_id): int(r.n_chars) for _, r in docs.iterrows()}
    ids = sorted(sh)

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    paired = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                paired.update((a, b))

    clusters = {}
    for i in ids:
        if i in paired:
            clusters.setdefault(find(i), []).append(i)

    exp = {}
    for root, mem in clusters.items():
        best = max(mem, key=lambda d: (ln[d], -d))
        tot = sum(ln[d] for d in mem)
        exp[root] = (best, len(mem), ln[best], tot - ln[best])

    got = q.q_dedup_canonical(SF).to_pandas()
    assert {int(r.cluster): (int(r.rep_doc), int(r.n_members),
                             int(r.chars_kept), int(r.chars_dropped))
            for _, r in got.iterrows()} == exp
    # a curation decision was actually made somewhere
    assert int(got.chars_dropped.sum()) > 0
