"""Brute twins for wave 86: spectral bisection cut, batched
effective-resistance Jacobi solves, Zipf OLS fit, min-plus doubling."""

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
    key = np.unique(np.concatenate(
        [s[keep] * ctx.n + d[keep], d[keep] * ctx.n + s[keep]]))
    return key // ctx.n, key % ctx.n


def _deflated_vec(ctx, src, dst, iters):
    """Brute mirror of `alg.fiedler_vector_refs`."""
    ar = np.asarray(ctx.arith, dtype=np.int64)

    def spmv(x):
        y = np.zeros(ctx.n)
        np.add.at(y, src, x[dst])
        return y

    x = np.full(ctx.n, 1.0 / math.sqrt(ctx.n))
    for _ in range(iters):
        y = spmv(x)
        x = y / math.sqrt(float(np.dot(y, y)))
    lam1 = float(np.dot(x, spmv(x)))
    b = 1.0 + (ar % 7)
    w = b / math.sqrt(float(np.dot(b, b)))
    v = w - float(np.dot(x, w)) * x
    v = v / math.sqrt(float(np.dot(v, v)))
    for _ in range(iters):
        y = spmv(v) - lam1 * float(np.dot(x, v)) * x
        v = y / math.sqrt(float(np.dot(y, y)))
    lam2 = float(np.dot(v, spmv(v)))
    return v, lam2


def test_fiedler_cut_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    v, lam2 = _deflated_vec(ctx, src, dst, q.EIG_ITERS)
    side = (np.round(v, 9) >= 0.0)
    deg = np.bincount(src, minlength=ctx.n)
    cut = int((side[src] & ~side[dst]).sum())
    vol_pos = int(deg[side].sum())
    vol_neg = int(deg.sum()) - vol_pos
    vmin = min(vol_pos, vol_neg)
    got = q.q_fiedler_cut(SF).to_pandas().iloc[0]
    assert abs(got.lambda2 - lam2) < 2e-6
    assert got.n_pos == int(side.sum())
    assert got.n_neg == ctx.n - int(side.sum())
    assert got.cut_edges == cut
    assert abs(got.conductance
               - (cut / vmin if vmin > 0 else 0.0)) < 2e-6
    # a bisection must actually split the graph
    assert 0 < got.n_pos < ctx.n


def test_effres_hubs_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    deg = np.bincount(src, minlength=ctx.n).astype(np.int64)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    top = np.lexsort((ar, -deg))[:q.EFFRES_HUBS]
    got = q.q_effres_hubs(SF).to_pandas()
    assert len(got) == q.EFFRES_HUBS * (q.EFFRES_HUBS - 1) // 2
    for _, row in got.iterrows():
        s, t = top[int(row.pa) - 1], top[int(row.pb) - 1]
        b = np.zeros(ctx.n)
        b[s], b[t] = 1.0, -1.0
        x = np.zeros(ctx.n)
        for _ in range(q.EFFRES_ITERS):
            ax = np.zeros(ctx.n)
            np.add.at(ax, src, x[dst])
            x = (b + ax) / (deg + 1.0)
        assert abs(row.r_eff - (x[s] - x[t])) < 2e-6
        # resistance between distinct hubs is strictly positive
        assert row.r_eff > 0


def test_zipf_fit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    cnt = Counter(t for txt in docs.text for t in txt.split(" "))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:q.ZIPF_K]
    y = np.log(np.array([c for _, c in top], dtype=float))
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    xm, ym = x.mean(), y.mean()
    sxx = float(((x - xm) ** 2).sum())
    sxy = float(((x - xm) * (y - ym)).sum())
    syy = float(((y - ym) ** 2).sum())
    slope = sxy / sxx
    got = q.q_zipf_fit(SF).to_pandas().iloc[0]
    assert got.n_tokens == len(top)
    assert abs(got.slope - slope) < 2e-6
    assert abs(got.intercept - (ym - slope * xm)) < 2e-6
    assert abs(got.r2 - sxy * sxy / (sxx * syy)) < 2e-6
    # frequency must decay with rank
    assert got.slope < 0


def test_minplus_doubling_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    deg = np.bincount(src, minlength=ctx.n).astype(np.int64)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    top = np.sort(np.lexsort((ar, -deg))[:q.DOUBLING_K])
    pos = {v: i for i, v in enumerate(top)}
    k = len(top)
    D = np.full((k, k), np.inf)
    np.fill_diagonal(D, 0.0)
    sel = np.isin(src, top) & np.isin(dst, top)
    for u, w in zip(src[sel], dst[sel]):
        D[pos[u], pos[w]] = 1.0
    for _ in range(q.DOUBLING_ROUNDS):
        D = np.minimum(D, (D[:, :, None] + D[None, :, :]).min(axis=1))
    iu = np.triu_indices(k, 1)
    d = D[iu]
    fin = np.isfinite(d)
    want = Counter(d[fin].astype(np.int64))
    unreach = int((~fin).sum())
    got = q.q_minplus_doubling(SF).to_pandas()
    gm = dict(zip(got.dist, got.pairs))
    assert {int(a): int(b) for a, b in want.items()} == {
        int(a): int(b) for a, b in gm.items() if a >= 0}
    assert gm.get(-1, 0) == unreach
    # every histogram distance respects the 2^rounds doubling horizon
    assert got.dist.max() <= 2 ** q.DOUBLING_ROUNDS
