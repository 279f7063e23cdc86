"""Twins for wave 102: durability faces. The oracle already pins the
end states; these tests pin the MECHANISM (resume engages, the delta
actually bypasses the base build, the MM file is a real interchange
artifact)."""

import os

import numpy as np

SF = "/root/testdata/sf0.001"


def test_pagerank_resumed_matches_plain(ray_session):
    from combblas_ray.pipelines import queries as q

    plain = q.q_pagerank(SF).to_pandas().sort_values("label")
    resumed = q.q_pagerank_resumed(SF).to_pandas().sort_values("label")
    assert plain.label.tolist() == resumed.label.tolist()
    assert np.array_equal(plain.score.to_numpy(),
                          resumed.score.to_numpy())
    # the snapshot file for the resume boundary must exist
    from combblas_ray.pipelines.context import CKPT_ROOT, get_context

    ctx = get_context(SF)
    ck = f"{CKPT_ROOT}/prresume_n{ctx.n}"
    snaps = os.listdir(ck)
    assert any(str(q.PR_RESUME_AT) in s for s in snaps), snaps


def test_cc_incremental_matches_full(ray_session):
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    full = alg.cc_fixed(ctx.engine("sym"), q.CC_ITERS)
    got = q.q_cc_incremental(SF).to_pandas().sort_values("label")
    exp_comp = ctx.gather_labels(full.astype(np.int64))
    exp_lab = ctx.gather_labels(np.arange(ctx.n))
    lut = dict(zip(exp_lab, exp_comp))
    for lb, cp in zip(got.label, got.comp):
        assert lut[lb] == cp
    # the withheld delta is non-empty (the update path actually ran)
    g = ctx.graph("sym")
    e = g.edges.to_pandas()
    pred = ((e.src.to_numpy() * 31 + e.dst.to_numpy()) % 101 == 0)
    assert pred.sum() > 0


def test_mm_roundtrip_file_is_real_mm(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import CKPT_ROOT, get_context

    got = q.q_mm_roundtrip(SF).to_pandas().iloc[0]
    ctx = get_context(SF)
    path = f"{CKPT_ROOT}/mmrt_n{ctx.n}.mtx"
    with open(path) as f:
        banner = f.readline()
        assert banner.startswith("%%MatrixMarket")
        dims = f.readline().split()
    n1, n2, nnz = int(dims[0]), int(dims[1]), int(dims[2])
    assert (n1, n2) == (ctx.n, ctx.n)
    assert nnz == int(got.nnz)
    # file body has exactly nnz data lines
    with open(path) as f:
        body = [ln for ln in f if not ln.startswith("%")]
    assert len(body) - 1 == nnz  # minus the dims line
