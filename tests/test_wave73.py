"""Brute twins for wave 73: Chebyshev spectral filter, fixed-round
conjugate gradient, and the unigram-LM quality scorer."""

import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _und(ctx):
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    key = np.unique(np.concatenate([s * ctx.n + d, d * ctx.n + s]))
    return key // ctx.n, key % ctx.n


def _spmv(n, src, dst, x):
    y = np.zeros(n, dtype=np.float64)
    np.add.at(y, src, x[dst])
    return y


def _labels(ctx):
    return np.asarray(ctx.gather_labels(np.arange(ctx.n))).astype(str)


def test_chebyshev_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    b = 1.0 + (ar % 7)
    deg = _spmv(ctx.n, src, dst, np.ones(ctx.n))
    lmax = 2.0 * (deg.max() + 1.0)

    def lt(v):
        return (2.0 / lmax) * (deg * v - _spmv(ctx.n, src, dst, v)) - v

    t_pp, t_p = b, lt(b)
    y = t_pp + t_p / 2.0
    for j in range(2, q.CHEB_ORDER + 1):
        t_j = 2.0 * lt(t_p) - t_pp
        y = y + t_j / (j + 1.0)
        t_pp, t_p = t_p, t_j
    got = q.q_chebyshev_filter(SF).to_pandas()
    want = dict(zip(_labels(ctx), y))
    assert len(got) == ctx.n
    assert np.abs(got.y.to_numpy()
                  - np.array([want[lb] for lb in got.label])).max() < 2e-6


def test_conjgrad_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    b = 1.0 + (ar % 7)
    deg = _spmv(ctx.n, src, dst, np.ones(ctx.n))

    def apply_a(v):  # (L + I) v
        return (deg + 1.0) * v - _spmv(ctx.n, src, dst, v)

    x = np.zeros(ctx.n)
    r = b.copy()
    p = b.copy()
    rr = float(np.dot(r, r))
    for _ in range(q.CG_ITERS):
        qv = apply_a(p)
        pq_ = float(np.dot(p, qv))
        alpha = rr / pq_ if pq_ > 0 else 0.0
        x = x + alpha * p
        r = r - alpha * qv
        rr_new = float(np.dot(r, r))
        beta = rr_new / rr if rr > 0 else 0.0
        p = r + beta * p
        rr = rr_new
    got = q.q_conjgrad_fixed(SF).to_pandas()
    want = dict(zip(_labels(ctx), x))
    assert len(got) == ctx.n
    assert np.abs(got.x.to_numpy()
                  - np.array([want[lb] for lb in got.label])).max() < 2e-6

    got_r = q.q_cg_resid(SF).to_pandas().iloc[0]
    assert abs(got_r.resid - math.sqrt(rr)) < 2e-6
    # CG monotonically shrinks ||r||_2 from ||b||_2 (L+I is SPD)
    assert got_r.resid < math.sqrt(float(np.dot(b, b)))


def test_lm_score_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "lang"]).to_pandas()
    toks = [t.split(" ") for t in docs.text]
    cnt = Counter(tok for ts in toks for tok in ts)
    n_tot = sum(cnt.values())
    v = len(cnt)
    per_lang: dict[str, list] = {}
    for ts, lang in zip(toks, docs.lang):
        h = -sum(math.log((cnt[t] + 1.0) / (n_tot + v))
                 for t in ts) / len(ts)
        a = per_lang.setdefault(lang, [0.0, 0])
        a[0] += h
        a[1] += 1
    got = q.q_lm_score(SF).to_pandas()
    assert set(got.lang) == set(per_lang)
    for _, row in got.iterrows():
        s, n = per_lang[row.lang]
        assert row.n_docs == n
        assert abs(row.mean_h - s / n) < 2e-6
    # sanity: cross-entropy must exceed the model's best-case token NLL
    assert (got.mean_h > 0).all()
