"""Brute twin for wave 77: PageRank per-iteration convergence metrics
(dangling mass + L1 delta) re-derived with dense numpy power iteration
over the weighted directed edge table."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_pagerank_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    src = np.asarray(e.src, dtype=np.int64)
    dst = np.asarray(e.dst, dtype=np.int64)
    w = np.asarray(e.w, dtype=np.float64)
    n = ctx.n
    outw = np.zeros(n)
    np.add.at(outw, src, w)
    dang = outw == 0.0
    d = 0.85
    r = np.full(n, 1.0 / n)
    want = []
    for _ in range(q.PR_TRACE_ITERS):
        dm = float(r[dang].sum())
        x = np.where(dang, 0.0, r / np.where(dang, 1.0, outw))
        contrib = np.zeros(n)
        np.add.at(contrib, dst, x[src] * w)
        r_new = (1.0 - d) / n + d * (contrib + dm / n)
        want.append((dm * n, float(np.abs(r_new - r).sum()) * n))
        r = r_new
    got = q.q_pagerank_trace(SF).to_pandas()
    assert list(got["iter"]) == list(range(1, q.PR_TRACE_ITERS + 1))
    wm = np.array([a for a, _ in want])
    wd = np.array([b for _, b in want])
    assert np.abs(got.dmass_n.to_numpy() - wm).max() < 2e-3
    assert np.abs(got.delta_n.to_numpy() - wd).max() < 2e-3
    # the L1 delta of the damped power iteration contracts monotonically
    assert (np.diff(got.delta_n.to_numpy()) < 0).all()
