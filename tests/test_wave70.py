"""Wave 70: round-5 hardening — LSH bucket caps, refs-only K-source
distance machinery, degree-refs, toy-n gates, overflow guards."""

import numpy as np
import pytest

import ray

from .conftest import brute_dense_matrix

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# LSH bucket cap: adversarial all-identical corpus must not emit
# quadratic pairs, must keep every doc connected to the canonical one
# ---------------------------------------------------------------------------


def _identical_docs(n):
    import pyarrow as pa

    text = "alpha beta gamma delta epsilon zeta eta theta"
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array([text] * n)})
    )


def test_minhash_lsh_bucket_cap_not_quadratic():
    from combblas_ray.functions.dedup import minhash_lsh_pairs

    n = 300
    docs = _identical_docs(n)
    pairs = minhash_lsh_pairs(docs, 0.5, bucket_cap=32,
                              cap_anchors=4).take_all()
    # anchor-star: far fewer than C(300,2)=44850, at most ~n*anchors
    assert 0 < len(pairs) <= n * 4
    # every doc connected to doc 0's cluster (dedup keeps working)
    seen = set()
    for r in pairs:
        assert r["jac"] == 1.0
        assert r["a"] < r["b"]
        seen.add(r["a"])
        seen.add(r["b"])
    assert seen == set(range(n))
    # anchors are the smallest ids
    assert {r["a"] for r in pairs} <= set(range(4))


def test_minhash_lsh_under_cap_unchanged(ray_session):
    """Below the cap the pair set is the exact full triangular set."""
    from combblas_ray.functions.dedup import minhash_lsh_pairs

    n = 20
    docs = _identical_docs(n)
    got = {(r["a"], r["b"]) for r in
           minhash_lsh_pairs(docs, 0.5, bucket_cap=512).take_all()}
    assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}


def test_embedding_lsh_bucket_cap_not_quadratic():
    import pyarrow as pa

    from combblas_ray.functions.ann import embedding_dup_pairs_lsh

    n = 256
    vec = [1.0, 0.5, 0.25, 0.125]
    emb = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array([vec] * n)})
    )
    pairs = embedding_dup_pairs_lsh(emb, 0.4, bucket_cap=32,
                                    cap_anchors=4).take_all()
    assert 0 < len(pairs) <= n * 4 * 2  # multi-probe may double-cover
    seen = set()
    for r in pairs:
        assert r["a"] < r["b"]
        seen.add(r["a"])
        seen.add(r["b"])
    assert seen == set(range(n))


# ---------------------------------------------------------------------------
# degree refs + distributed top-k + K-source chunked distances
# ---------------------------------------------------------------------------


def test_weights_refs_match_dense(ctx500):
    eng = ctx500.engine("directed", g=2)
    A = brute_dense_matrix(ctx500)
    got_in = eng.unchunk(eng.in_weights_refs())
    got_out = eng.unchunk(eng.out_weights_refs())
    assert np.allclose(got_in, A.sum(axis=1))
    assert np.allclose(got_out, A.sum(axis=0))


def test_top_by_degree_matches_brute(ctx500):
    from combblas_ray.pipelines.algorithms import top_by_degree

    eng = ctx500.engine("sym", g=2)
    deg = eng.in_weights().astype(np.int64)
    ar = np.asarray(ctx500.arith, dtype=np.int64)
    for k in (1, 2, 7, 32):
        want = np.lexsort((ar, -deg))[:k]
        got = top_by_degree(
            eng, ctx500.vdict.arith_slice_refs(eng.bounds), k)
        assert np.array_equal(got, want), k


def test_kseed_distances_refs_match_dense_loop(ctx500):
    from combblas_ray.pipelines.algorithms import kseed_distances_refs

    eng = ctx500.engine("sym", g=2)
    seeds = np.array([3, 250, 499], dtype=np.int64)
    D_refs = kseed_distances_refs(eng, seeds, iters=6)
    got = np.concatenate([np.asarray(c) for c in ray.get(D_refs)],
                         axis=1)
    # dense driver twin
    D = np.full((3, ctx500.n), np.inf)
    D[np.arange(3), seeds] = 0.0
    for _ in range(6):
        D = np.minimum(D, eng.spmm(D, "min_plus"))
    assert np.array_equal(np.isfinite(got), np.isfinite(D))
    assert np.allclose(got[np.isfinite(got)], D[np.isfinite(D)])


# ---------------------------------------------------------------------------
# O(n)-driver-state audit: the K-source query family must not touch the
# toy-n lazies (ctx.labels / ctx.arith stay unmaterialized)
# ---------------------------------------------------------------------------


def test_ksource_queries_leave_lazies_cold(ray_session):
    from combblas_ray.pipelines import queries as Q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    saved = (ctx._labels, ctx._arith)
    ctx._labels = ctx._arith = None
    try:
        for fn in (Q.q_hub_bisector, Q.q_msbfs, Q.q_distance_hist,
                   Q.q_apsp_top, Q.q_core_periphery_mix,
                   Q.q_hub_asymmetry, Q.q_hub_ecc, Q.q_hub_coreach):
            t = fn(SF)
            assert t.num_rows >= 1
            assert ctx._labels is None and ctx._arith is None, fn.__name__
    finally:
        ctx._labels, ctx._arith = saved


def test_toy_n_guard_raises():
    from combblas_ray.pipelines.context import GraphContext

    ctx = GraphContext(n=GraphContext.TOY_N_MAX + 1, vdict=None)
    with pytest.raises(RuntimeError, match="gated"):
        _ = ctx.labels
    with pytest.raises(RuntimeError, match="gated"):
        _ = ctx.arith


# ---------------------------------------------------------------------------
# overflow / missing-label guards (round-5 advice)
# ---------------------------------------------------------------------------


def test_payload_sum_narrow_dtype_overflow_raises():
    from combblas_ray.core.engine import _payload_combine

    vals = np.array([2**30, 2**30, 2**30], dtype=np.int32)
    inv = np.zeros(3, dtype=np.int64)
    first = np.array([0], dtype=np.int64)
    with pytest.raises(OverflowError, match="int64"):
        _payload_combine(vals, first, inv, "sum")
    ok = _payload_combine(np.array([3, 4], dtype=np.int32),
                          np.array([0], dtype=np.int64),
                          np.zeros(2, dtype=np.int64), "sum")
    assert ok.dtype == np.int32 and ok[0] == 7


def test_lookup_missing_label_raises(ctx500):
    with pytest.raises(KeyError, match="not in vertex dictionary"):
        ctx500.vdict.lookup_id("zz_not_a_label")


def test_sigma_level_guard_trips_on_mass(ctx500):
    from combblas_ray.pipelines.algorithms import _sigma_level_guard

    eng = ctx500.engine("sym", g=2)
    ok = eng.chunk(np.ones(ctx500.n, dtype=np.int64))
    assert _sigma_level_guard(eng, ok) == ctx500.n
    hot = eng.chunk(np.full(ctx500.n, np.int64(1) << 58))
    with pytest.raises(NotImplementedError, match="tripwire"):
        _sigma_level_guard(eng, hot)


# ---------------------------------------------------------------------------
# direction-optimizing BFS: true bottom-up kernel vs the dense-SpMV twin
# ---------------------------------------------------------------------------


def test_bfs_parents_bottomup_matches_dense_twin(ctx500):
    from combblas_ray.pipelines.algorithms import bfs_parents

    eng = ctx500.engine("sym", g=2)
    for root in (0, 17, 333):
        p_bu, d_bu = bfs_parents(eng, root, bottomup=True)
        p_td, d_td = bfs_parents(eng, root, bottomup=False)
        assert np.array_equal(p_bu, p_td), root
        assert np.array_equal(d_bu, d_td), root


def test_bfs_distances_bottomup_matches_dense_twin(ctx500):
    from combblas_ray.pipelines.algorithms import bfs_distances_auto

    eng = ctx500.engine("sym", g=2)
    for root in (0, 42):
        a = bfs_distances_auto(eng, root, bottomup=True)
        b = bfs_distances_auto(eng, root, bottomup=False)
        assert np.array_equal(np.isfinite(a), np.isfinite(b))
        assert np.array_equal(a[np.isfinite(a)], b[np.isfinite(b)])


def test_bfs_parents_tree_valid_bottomup(ctx500):
    """Every non-root parent is a real neighbor one level closer."""
    from combblas_ray.pipelines.algorithms import bfs_parents
    from .conftest import brute_dense_matrix

    A = brute_dense_matrix(ctx500)
    U = ((A + A.T) > 0)
    np.fill_diagonal(U, False)
    eng = ctx500.engine("sym", g=2)
    p, d = bfs_parents(eng, 7)
    assert p[7] == 7 and d[7] == 0
    for v in np.nonzero(p >= 0)[0]:
        if v == 7:
            continue
        assert U[v, p[v]], v
        assert d[v] == d[p[v]] + 1, v
        # min tie-break: no smaller neighbor at the previous level
        nbrs = np.nonzero(U[v])[0]
        prev = nbrs[d[nbrs] == d[v] - 1]
        assert p[v] == prev.min(), v


# ---------------------------------------------------------------------------
# distributed matrix-market writer: byte parity with the gathered twin
# ---------------------------------------------------------------------------


def test_write_mm_matches_gathered_twin(ctx500, tmp_path):
    from combblas_ray.sources.io import write_matrix_market

    g = ctx500.graph("directed")
    new_p = str(tmp_path / "dist.mtx")
    write_matrix_market(g, new_p)
    # the old driver-gathered writer, inlined as the parity twin
    rows = g.edges.take_all()
    old_p = tmp_path / "gathered.mtx"
    with open(old_p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{g.n} {g.n} {len(rows)}\n")
        for r in sorted(rows, key=lambda r: (r["dst"], r["src"])):
            f.write(f"{int(r['dst']) + 1} {int(r['src']) + 1} {r['w']:g}\n")
    assert open(new_p).read() == old_p.read_text()
    # no leftover shard dirs
    assert not [d for d in tmp_path.iterdir() if d.name.startswith(".mm_")]


# ---------------------------------------------------------------------------
# chunked-refs broadcast-helper siblings (round-5 advice #5)
# ---------------------------------------------------------------------------


def test_prune_column_refs_matches_broadcast(ctx500):
    from combblas_ray.core.partition import chunk_bounds

    g = ctx500.graph("directed")
    bounds = chunk_bounds(ctx500.n, 4)
    p_refs = g.reduce_dense_refs("row", "max", bounds)
    got = sorted((r["src"], r["dst"], r["w"]) for r in
                 g.prune_column_refs(p_refs, bounds, "lt")
                 .edges.take_all())
    # broadcast twin
    pvals = np.zeros(ctx500.n)
    for t in ray.get(g.reduce("row", "max").to_arrow_refs()):
        if t.num_rows and "v" in t.column_names:
            pvals[np.asarray(t.column("v"), dtype=np.int64)] = np.asarray(
                t.column("val"))
    want = sorted((r["src"], r["dst"], r["w"]) for r in
                  g.prune_column(pvals, "lt").edges.take_all())
    assert got == want


def test_out_weight_sums_refs_match_dense(ctx500):
    from combblas_ray.core.partition import chunk_bounds

    g = ctx500.graph("directed")
    bounds = chunk_bounds(ctx500.n, 3)
    refs = g.out_weight_sums_refs(bounds)
    got = np.concatenate(ray.get(refs))
    assert np.allclose(got, g.out_weight_sums())


def test_dim_apply_refs_matches_dense(ctx500, tmp_path):
    from combblas_ray.core.engine import SpmvEngine

    gph = ctx500.graph("directed")
    e1 = SpmvEngine.from_graph(gph, 2, str(tmp_path / "a"))
    e2 = SpmvEngine.from_graph(gph, 2, str(tmp_path / "b"))
    v = ((np.arange(ctx500.n) % 7) + 1).astype(np.float64)
    e1.dim_apply("col", v)
    e2.dim_apply_refs("col", e2.chunk(v))
    x = np.arange(ctx500.n, dtype=np.float64)
    assert np.allclose(e1.spmv(x, "plus_times"), e2.spmv(x, "plus_times"))
    e1.shutdown()
    e2.shutdown()


# ---------------------------------------------------------------------------
# hypersparse (DCSC-analog) block layout: parity with the dense layout
# ---------------------------------------------------------------------------


def _sparse_graph(n=3000, m=120, seed=3):
    import pyarrow as pa

    from combblas_ray.core.graph import Graph

    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = (rng.randint(1, 5, len(src))).astype(np.float64)
    edges = ray.data.from_arrow(pa.table(
        {"src": pa.array(src), "dst": pa.array(dst), "w": pa.array(w)}))
    g = Graph(n=n, edges=edges).dedup_sum()
    A = np.zeros((n, n))
    for s, d, ww in zip(src, dst, w):
        A[d, s] += ww
    return g, A


def test_hypersparse_blocks_engage_and_match_dense(ray_session, tmp_path):
    from combblas_ray.core.engine import SpmvEngine

    g, A = _sparse_graph()
    eng = SpmvEngine.from_graph(g, 2, str(tmp_path / "hs"))
    # the layout must actually be hypersparse at this density
    hyper = ray.get(eng.actors[0].ping.remote()) is not None
    assert hyper
    blocks_hyper = []
    for a in eng.actors:
        blocks_hyper.append(ray.get(a.__ray_call__.remote(
            lambda self: [b.urows is not None for b in self.blocks])))
    assert any(any(bl) for bl in blocks_hyper)
    n = g.n
    x = ((np.arange(n) * 13) % 17 + 1).astype(np.float64)
    assert np.allclose(eng.spmv(x, "plus_times"), A @ x)
    # non-plus semiring exercises the compact reduce + scatter path
    with np.errstate(invalid="ignore"):
        M = np.where(A > 0, A, np.inf)
        want_mp = (M + x[None, :]).min(axis=1)
    assert np.allclose(eng.spmv(x, "min_plus"), want_mp)
    want_s2 = np.where(A > 0, x[None, :], np.inf).min(axis=1)
    assert np.allclose(eng.spmv(x, "select2nd_min"), want_s2)
    assert np.allclose(eng.in_weights(), A.sum(axis=1))
    assert np.allclose(eng.unchunk(eng.in_weights_refs()), A.sum(axis=1))
    eng.shutdown()


def test_hypersparse_bfs_both_kernels(ray_session, tmp_path):
    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines.algorithms import bfs_parents

    # star + chain: root reaches everything; n >> nnz forces hypersparse
    import pyarrow as pa

    n = 4000
    hub = 0
    others = np.arange(1, 400, dtype=np.int64)
    src = np.concatenate([np.full(len(others), hub), others])
    dst = np.concatenate([others, np.full(len(others), hub)])
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "w": pa.array(np.ones(len(src)))}))
    g = Graph(n=n, edges=edges).dedup_sum()
    eng = SpmvEngine.from_graph(g, 3, str(tmp_path / "hsb"),
                                structural=True)
    p_bu, d_bu = bfs_parents(eng, 0, bottomup=True)
    p_td, d_td = bfs_parents(eng, 0, bottomup=False)
    assert np.array_equal(p_bu, p_td)
    assert np.array_equal(d_bu, d_td)
    assert d_bu[1] == 1 and p_bu[1] == 0
    eng.shutdown()
