"""Brute twins for wave 80: Bellman-Ford relaxation counts and
label-propagation flip counts."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_sssp_relax_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    src = np.asarray(e.src, dtype=np.int64)
    dst = np.asarray(e.dst, dtype=np.int64)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    ln = (1.0 + (ar[src] + 2 * ar[dst]) % 7).astype(np.float64)
    root = int(np.asarray(ctx.lookup_id("m_1")))
    d = np.full(ctx.n, np.inf)
    d[root] = 0.0
    want = []
    for _ in range(q.SSSP_ITERS):
        cand = np.full(ctx.n, np.inf)
        np.minimum.at(cand, dst, d[src] + ln)
        nd = np.minimum(d, cand)
        c = int((nd < d).sum())
        if not c:
            break
        want.append(c)
        d = nd
    got = q.q_sssp_relax_trace(SF).to_pandas()
    assert list(got["round"]) == list(range(1, len(want) + 1))
    assert list(got.n_improved) == want
    # relaxation counts end when the fixpoint is reached
    assert (got.n_improved > 0).all()


def test_labelprop_flip_trace_vs_brute(ray_session):
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
    ar = np.asarray(ctx.arith, dtype=np.int64)
    cls = ar % q.LP_CLASSES
    want = []
    for _ in range(q.LP_ITERS):
        counts = np.zeros((ctx.n, q.LP_CLASSES), dtype=np.int64)
        np.add.at(counts, (ud, cls[us]), 1)
        best = counts.argmax(axis=1)  # argmax = smallest class on ties
        has = counts.sum(axis=1) > 0
        new = np.where(has, best, cls)
        want.append(int((new != cls).sum()))
        cls = new
    got = q.q_labelprop_flip_trace(SF).to_pandas()
    assert list(got["round"]) == list(range(1, q.LP_ITERS + 1))
    assert list(got.n_flips) == want
