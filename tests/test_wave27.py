"""Brute twins for wave 27: embedding label stats, global deciles,
peak hour, commit nibbles, hapax counts."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_emb_label_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_emb_label_stats(SF).to_pandas().set_index("label")
    emb = _pq("embeddings")
    for lab, g in emb.groupby("label"):
        n2 = 0
        for e in g.embedding:
            v = np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                         * (1 << 20)).astype(np.int64)
            n2 += int((v * v).sum())
        assert got.loc[lab, "n"] == len(g)
        assert got.loc[lab, "sum_norm2"] == n2


def test_doc_deciles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_doc_deciles(SF).to_pandas().set_index("doc_id")
    docs = _pq("documents").sort_values(["n_chars", "doc_id"])
    n, k = len(docs), q.DECILE_K
    size, rem = n // k, n % k
    big = rem * (size + 1)
    want = {}
    for rank, did in enumerate(docs.doc_id):
        if rank < big:
            t = rank // (size + 1)
        else:
            t = rem + (rank - big) // size
        want[did] = t + 1
    assert dict(zip(got.index, got.decile)) == want


def test_peak_hour_load_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_peak_hour_load(SF).to_pandas().set_index("user_id")
    ev = _pq("events")
    hr = (ev.ts.astype("datetime64[us]").astype("int64")
          // 3_600_000_000)
    df = pd.DataFrame({"u": ev.user_id, "h": hr})
    for uid, g in df.groupby("u"):
        cnt = Counter(g.h)
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got.loc[uid, "peak_hour"] == best[0]
        assert got.loc[uid, "peak_cnt"] == best[1]


def test_commit_nibbles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as C

    got = q.q_commit_nibbles(SF).to_pandas().set_index("nibble")
    n = C.n_files_for(SF)
    df = C.corpus_batch(np.arange(n), n).to_pandas()
    cnt = Counter(c[-1] for c in df["commit"])
    assert dict(zip(got.index, got.cnt)) == dict(cnt)


def test_hapax_counts_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_hapax_counts(SF).to_pandas().set_index("lang")
    docs = _pq("documents")
    for lang, g in docs.groupby("lang"):
        cnt = Counter()
        for t in g.text:
            cnt.update(t.split(" "))
        assert got.loc[lang, "n_distinct"] == len(cnt)
        assert got.loc[lang, "n_hapax"] == sum(
            1 for v in cnt.values() if v == 1)
