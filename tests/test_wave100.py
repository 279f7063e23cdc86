"""Brute twins for wave 100: PageRank-composition analytics."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _pr_brute(ctx, iters, damping=0.85):
    """Reference dense PageRank matching the engine convention
    (column-stochastic on out-weights, dangling mass redistributed)."""
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    w = np.asarray(e.w, dtype=np.float64)
    keep = s != d
    # dedup-sum multi-edges like the engine build does
    key = s[keep] * ctx.n + d[keep]
    uk, inv = np.unique(key, return_inverse=True)
    ww = np.bincount(inv, weights=w[keep])
    s2, d2 = uk // ctx.n, uk % ctx.n
    n = ctx.n
    ow = np.bincount(s2, weights=ww, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, d2, r[s2] * ww / ow[s2])
        dang = r[ow == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dang / n)
    return r


def _score_u(ctx, iters):
    r = _pr_brute(ctx, iters)
    return np.round(np.round(r * ctx.n, 6) * 1_000_000).astype(np.int64)


def test_pr_deg_footrule_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    su = _score_u(ctx, q.PR_ITERS)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    ind = np.bincount(np.unique(s[keep] * ctx.n + d[keep]) % ctx.n,
                      minlength=ctx.n)
    n = ctx.n
    ids = np.arange(n)
    r1 = np.empty(n, dtype=np.int64)
    r1[np.lexsort((ids, -su))] = np.arange(1, n + 1)
    r2 = np.empty(n, dtype=np.int64)
    r2[np.lexsort((ids, -ind))] = np.arange(1, n + 1)
    diff = r1 - r2
    got = q.q_pr_deg_footrule(SF).to_pandas().iloc[0]
    assert (int(got.n), int(got.footrule), int(got.d2_sum)) == \
        (n, int(np.abs(diff).sum()), int((diff * diff).sum()))
    # footrule is bounded by n^2 / 2
    assert int(got.footrule) <= n * n // 2


def test_pr_mass_by_comp_vs_brute(ray_session):
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    su = _score_u(ctx, q.PR_ITERS)
    comp = alg.cc_fixed(ctx.engine("sym"), q.CC_ITERS)
    got = q.q_pr_mass_by_comp(SF).to_pandas()
    uk = np.unique(comp)
    assert len(got) == len(uk)
    assert int(got.n_vertices.sum()) == ctx.n
    # total mass conserved: sum over components == sum of all scores
    assert int(got.mass_u.sum()) == int(su.sum())
    lut = {c: int(su[comp == c].sum()) for c in uk}
    labs = dict(zip(got.comp, got.mass_u))
    exp_labs = ctx.gather_labels(uk.astype(np.int64))
    for c, lb in zip(uk, exp_labs):
        assert int(labs[lb]) == lut[c]


def test_pr_lorenz_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    su = _score_u(ctx, q.PR_ITERS)
    n = ctx.n
    order = np.lexsort((np.arange(n), su))
    dec = (10 * np.arange(n, dtype=np.int64)) // n
    ms = su[order]
    got = q.q_pr_lorenz(SF).to_pandas().sort_values("decile")
    assert got.n.tolist() == np.bincount(dec, minlength=10).tolist()
    assert got.mass_u.tolist() == [int(ms[dec == d].sum())
                                   for d in range(10)]
    # Lorenz: decile masses are non-decreasing (sorted ascending)
    avg = got.mass_u.to_numpy() / got.n.to_numpy()
    assert (np.diff(avg) >= 0).all()
