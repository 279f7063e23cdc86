"""Brute twins for wave 81: widest-path relaxation counts, Katz mass
growth, and the LSH precision/recall audit."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_widest_relax_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    src = np.asarray(e.src, dtype=np.int64)
    dst = np.asarray(e.dst, dtype=np.int64)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    ln = (1.0 + (ar[src] + 2 * ar[dst]) % 7).astype(np.float64)
    root = int(np.asarray(ctx.lookup_id("m_1")))
    b = np.full(ctx.n, -np.inf)
    b[root] = q.BNECK_INF
    want = []
    for _ in range(q.WIDEST_ITERS):
        cand = np.full(ctx.n, -np.inf)
        np.maximum.at(cand, dst, np.minimum(b[src], ln))
        nb = np.maximum(b, cand)
        c = int((nb > b).sum())
        if not c:
            break
        want.append(c)
        b = nb
    got = q.q_widest_relax_trace(SF).to_pandas()
    assert list(got["round"]) == list(range(1, len(want) + 1))
    assert list(got.n_improved) == want


def test_katz_growth_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    src = np.asarray(e.src, dtype=np.int64)
    dst = np.asarray(e.dst, dtype=np.int64)
    key = np.unique(src * ctx.n + dst)  # structural distinct pairs
    us, ud = key // ctx.n, key % ctx.n
    x = np.ones(ctx.n)
    want = []
    for _ in range(q.KATZ_ITERS):
        y = np.zeros(ctx.n)
        np.add.at(y, ud, x[us])
        x = 1.0 + q.KATZ_ALPHA * y
        want.append(float(x.sum()))
    got = q.q_katz_growth_trace(SF).to_pandas()
    assert list(got["iter"]) == list(range(1, q.KATZ_ITERS + 1))
    # dyadic-exact: bit-for-bit equality, no tolerance
    assert list(got.sum_x) == want
    # the truncated Katz series grows monotonically
    assert all(b > a for a, b in zip(want, want[1:]))


def test_lsh_pr_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.functions import dedup as D

    got = q.q_lsh_pr_audit(SF).to_pandas().iloc[0]
    import ray

    lsh = D.minhash_lsh_pairs(q._docs(SF), tau=0.5).to_pandas()
    exact = D.jaccard_pairs(q._docs(SF), tau=0.5).to_pandas()

    def keys(df):
        if not len(df):
            return set()
        a = df.iloc[:, 0].to_numpy().astype(np.int64)
        b = df.iloc[:, 1].to_numpy().astype(np.int64)
        return set(map(tuple, np.sort(np.stack([a, b], axis=1),
                                      axis=1).tolist()))

    ls, ex = keys(lsh), keys(exact)
    tp = len(ls & ex)
    assert got.n_lsh == len(ls)
    assert got.n_exact == len(ex)
    assert got.n_match == tp
    assert abs(got.precision - (tp / len(ls) if ls else 1.0)) < 1e-9
    assert abs(got.recall - (tp / len(ex) if ex else 1.0)) < 1e-9
    assert 0.0 <= got.precision <= 1.0 and 0.0 <= got.recall <= 1.0
