import numpy as np

from combblas_ray.pipelines.pagerank import pagerank

from .conftest import brute_dense_matrix


def ref_pagerank(A, iters=None, tol=1e-10, d=0.85, max_iters=200):
    n = A.shape[0]
    outw = A.sum(axis=0)
    dang = outw == 0
    r = np.full(n, 1 / n)
    k = 0
    while True:
        x = np.where(dang, 0, r / np.where(dang, 1, outw))
        y = A @ x
        rn = (1 - d) / n + d * (y + r[dang].sum() / n)
        delta = np.abs(rn - r).sum()
        r = rn
        k += 1
        if iters is not None and k >= iters:
            return r
        if iters is None and (delta < tol or k >= max_iters):
            return r


def test_pagerank_allclose_1e6(ctx500):
    A = brute_dense_matrix(ctx500)
    eng = ctx500.engine("directed", g=2)
    r, info = pagerank(eng, tol=1e-12)
    ref = ref_pagerank(A, tol=1e-12)
    assert np.allclose(r, ref, rtol=1e-6, atol=1e-12)
    assert abs(r.sum() - 1.0) < 1e-9


def test_pagerank_fixed_iters_exact(ctx500):
    A = brute_dense_matrix(ctx500)
    eng = ctx500.engine("directed", g=2)
    r, _ = pagerank(eng, iters=7)
    ref = ref_pagerank(A, iters=7)
    assert np.allclose(r, ref, rtol=1e-12, atol=1e-15)


def test_pagerank_checkpoint_resume(ctx500, tmp_path):
    eng = ctx500.engine("directed", g=2)
    full, _ = pagerank(eng, iters=10)
    ck = str(tmp_path / "pr")
    # run 6 iterations, checkpointing every 3
    r1, info1 = pagerank(eng, iters=6, ckpt_dir=ck, ckpt_every=3)
    # resume run: asks for 10, should restart from iter 6
    r2, info2 = pagerank(eng, iters=10, ckpt_dir=ck, ckpt_every=3)
    assert info2["resumed_at"] == 6
    assert np.allclose(r2, full, rtol=1e-14, atol=1e-16)


def test_pagerank_prenormalized_matches(ctx500, tmp_path):
    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.pipelines.pagerank import pagerank_prenormalized

    # dedicated engine: prenormalization mutates resident weights
    eng = SpmvEngine.from_graph(
        ctx500.graph("directed"), 2, str(tmp_path / "pre")
    )
    r_pre, _ = pagerank_prenormalized(eng, iters=10)
    A = brute_dense_matrix(ctx500)
    ref = ref_pagerank(A, iters=10)
    assert np.allclose(r_pre, ref, rtol=1e-10, atol=1e-14)
    eng.shutdown()
