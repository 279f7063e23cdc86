"""Brute twins for wave 76: power-iteration Rayleigh trace and the
per-language length-vs-LM-score Pearson correlation."""

import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_power_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(np.concatenate([s[keep] * ctx.n + d[keep],
                                    d[keep] * ctx.n + s[keep]]))
    us, ud = key // ctx.n, key % ctx.n

    def spmv(x):
        y = np.zeros(ctx.n)
        np.add.at(y, us, x[ud])
        return y

    x = np.full(ctx.n, 1.0 / math.sqrt(ctx.n))
    want = []
    y = spmv(x)
    for _ in range(q.EIG_ITERS):
        want.append(float(np.dot(x, y)))
        x = y / math.sqrt(float(np.dot(y, y)))
        y = spmv(x)
    got = q.q_power_trace(SF).to_pandas()
    assert list(got["iter"]) == list(range(1, q.EIG_ITERS + 1))
    assert np.abs(got.rayleigh.to_numpy() - np.array(want)).max() < 2e-6
    # the Rayleigh trace of power iteration is non-decreasing
    assert (np.diff(got.rayleigh.to_numpy()) > -1e-9).all()


def test_lm_len_corr_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "lang"]).to_pandas()
    toks = [t.split(" ") for t in docs.text]
    cnt = Counter(tok for ts in toks for tok in ts)
    n_tot = sum(cnt.values())
    v = len(cnt)
    per: dict[str, list] = {}
    for ts, lang in zip(toks, docs.lang):
        h = -sum(math.log((cnt[t] + 1.0) / (n_tot + v))
                 for t in ts) / len(ts)
        per.setdefault(lang, []).append((float(len(ts)), h))
    got = q.q_lm_len_corr(SF).to_pandas()
    assert set(got.lang) == set(per)
    for _, row in got.iterrows():
        xy = np.array(per[row.lang])
        x, y = xy[:, 0], xy[:, 1]
        n = float(len(x))
        den = ((n * (x * x).sum() - x.sum() ** 2)
               * (n * (y * y).sum() - y.sum() ** 2))
        r = ((n * (x * y).sum() - x.sum() * y.sum()) / math.sqrt(den)
             if den > 0 else 0.0)
        assert row.n_docs == len(x)
        assert abs(row.r - r) < 2e-6
        assert -1.0 - 1e-9 <= row.r <= 1.0 + 1e-9
