"""Brute twins for wave 41: winsorized stats, never-discounted, label
centroids, max idle gap, token-length histogram."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_winsorized_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_winsorized_stats(SF).to_pandas()
    ev = _pq("events")
    c = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    v = np.sort(c)
    n = len(v)
    lo = v[max(1, -(-q.WINS_LO * n // 100)) - 1]
    hi = v[max(1, -(-q.WINS_HI * n // 100)) - 1]
    assert got.lo[0] == lo and got.hi[0] == hi
    assert got.n[0] == n
    assert got.clipped_sum[0] == np.clip(c, lo, hi).sum()


def test_never_discounted_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_never_discounted(SF).to_pandas()
    li = _pq("lineitem")
    dp = np.floor(li.l_discount.to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    mx = pd.DataFrame({"p": li.l_partkey, "d": dp}).groupby("p").d.max()
    assert got.n_parts[0] == len(mx)
    assert got.never_discounted[0] == int((mx == 0).sum())


def test_label_centroids_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_label_centroids(SF).to_pandas()
    emb = _pq("embeddings")
    mat = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                             * (1 << 20)).astype(np.int64)
                    for e in emb.embedding])
    assert (mat >= 0).all()  # non-negative domain: trunc == floor
    lab = emb.label.to_numpy()
    gd = {(r.label, r.dim): r.centroid_q for r in got.itertuples()}
    for l in np.unique(lab):
        sub = mat[lab == l]
        for d in range(mat.shape[1]):
            assert gd[(l, d)] == sub[:, d].sum() // len(sub)


def test_max_idle_gap_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_max_idle_gap(SF).to_pandas()
    ev = _pq("events")
    t = np.sort(ev.ts.astype("datetime64[us]").astype("int64"))
    gaps = np.diff(t)
    order = np.lexsort((t[:-1], -gaps))
    assert got.gap_us[0] == gaps[order[0]]
    assert got.at_us[0] == t[:-1][order[0]]


def test_tok_len_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_tok_len_hist(SF).to_pandas().set_index("len")
    docs = _pq("documents")
    cnt = Counter()
    for text in docs.text:
        for tok in text.split(" "):
            cnt[len(tok)] += 1
    assert dict(zip(got.index, got.cnt)) == dict(cnt)
