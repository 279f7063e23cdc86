"""Brute twins for wave 74: SALSA authority walk, deflated-power
lambda_2, and the LM outlier census."""

import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _dir_pairs(ctx):
    """Distinct directed structural pairs, no loops."""
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(s[keep] * ctx.n + d[keep])
    return key // ctx.n, key % ctx.n


def _und(ctx):
    s, d = _dir_pairs(ctx)
    key = np.unique(np.concatenate([s * ctx.n + d, d * ctx.n + s]))
    return key // ctx.n, key % ctx.n


def _labels(ctx):
    return np.asarray(ctx.gather_labels(np.arange(ctx.n))).astype(str)


def test_salsa_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _dir_pairs(ctx)
    din = np.bincount(dst, minlength=ctx.n).astype(float)
    dout = np.bincount(src, minlength=ctx.n).astype(float)
    a = np.ones(ctx.n)
    for _ in range(q.SALSA_ITERS):
        h_sum = np.zeros(ctx.n)
        np.add.at(h_sum, src, a[dst])
        h = np.where(dout > 0, h_sum / np.where(dout > 0, dout, 1.0), 0.0)
        a_sum = np.zeros(ctx.n)
        np.add.at(a_sum, dst, h[src])
        a = np.where(din > 0, a_sum / np.where(din > 0, din, 1.0), 0.0)
    got = q.q_salsa_fixed(SF).to_pandas()
    want = dict(zip(_labels(ctx), a))
    assert len(got) == ctx.n
    assert np.abs(got.auth.to_numpy()
                  - np.array([want[lb] for lb in got.label])).max() < 2e-6


def test_lambda2_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    ar = np.asarray(ctx.arith, dtype=np.int64)

    def spmv(x):
        y = np.zeros(ctx.n)
        np.add.at(y, src, x[dst])
        return y

    x = np.full(ctx.n, 1.0 / math.sqrt(ctx.n))
    for _ in range(q.EIG_ITERS):
        y = spmv(x)
        x = y / math.sqrt(float(np.dot(y, y)))
    lam1 = float(np.dot(x, spmv(x)))

    b = 1.0 + (ar % 7)
    w = b / math.sqrt(float(np.dot(b, b)))
    v = w - float(np.dot(x, w)) * x
    v = v / math.sqrt(float(np.dot(v, v)))
    for _ in range(q.EIG_ITERS):
        y = spmv(v) - lam1 * float(np.dot(x, v)) * x
        v = y / math.sqrt(float(np.dot(y, y)))
    lam2 = float(np.dot(v, spmv(v)))

    got = q.q_lambda2(SF).to_pandas().iloc[0]
    assert abs(got.lambda1 - lam1) < 2e-6
    assert abs(got.lambda2 - lam2) < 2e-6
    # spectral sanity: the deflated estimate sits strictly below lambda_1
    assert got.lambda2 < got.lambda1


def test_lm_outliers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "lang"]).to_pandas()
    toks = [t.split(" ") for t in docs.text]
    cnt = Counter(tok for ts in toks for tok in ts)
    n_tot = sum(cnt.values())
    v = len(cnt)
    hs: dict[str, list] = {}
    for ts, lang in zip(toks, docs.lang):
        h = -sum(math.log((cnt[t] + 1.0) / (n_tot + v))
                 for t in ts) / len(ts)
        hs.setdefault(lang, []).append(h)
    got = q.q_lm_outliers(SF).to_pandas()
    assert set(got.lang) == set(hs)
    for _, row in got.iterrows():
        arr = np.array(hs[row.lang])
        m = arr.mean()
        sig = math.sqrt(max(float((arr * arr).mean() - m * m), 0.0))
        assert row.n_docs == len(arr)
        assert row.n_out == int((arr > m + 2.0 * sig).sum())
