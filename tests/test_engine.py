import numpy as np
import pytest

from .conftest import brute_dense_matrix


@pytest.fixture(scope="module")
def dense_A(ctx500):
    return brute_dense_matrix(ctx500)


def test_spmv_plus_times_matches_dense(ctx500, dense_A):
    eng = ctx500.engine("directed", g=2)
    x = ((np.arange(ctx500.n) * 7) % 13).astype(np.float64)
    y = eng.spmv(x, "plus_times")
    assert np.allclose(y, dense_A @ x)


def test_spmv_min_plus_matches_dense(ctx500, dense_A):
    eng = ctx500.engine("directed", g=2)
    x = ((np.arange(ctx500.n) * 3) % 20).astype(np.float64)
    with np.errstate(invalid="ignore"):
        M = np.where(dense_A > 0, dense_A, np.inf)
        expect = (M + x[None, :]).min(axis=1)
    y = eng.spmv(x, "min_plus")
    assert np.allclose(y, expect)


def test_cross_plan_agreement_grids(ctx500):
    """Same SpMV under different 2D grids must agree exactly (the
    reference's cross-kernel agreement strategy, MultTest.cpp:162-239)."""
    x = np.arange(ctx500.n, dtype=np.float64)
    y2 = ctx500.engine("directed", g=2).spmv(x, "plus_times")
    y4 = ctx500.engine("directed", g=4).spmv(x, "plus_times")
    assert np.allclose(y2, y4, rtol=1e-12, atol=1e-12)
    m2 = ctx500.engine("directed", g=2).spmv(x, "select2nd_min")
    m4 = ctx500.engine("directed", g=4).spmv(x, "select2nd_min")
    assert np.array_equal(m2, m4)


def test_out_in_weights(ctx500, dense_A):
    eng = ctx500.engine("directed", g=2)
    assert np.allclose(eng.out_weights(), dense_A.sum(axis=0))
    assert np.allclose(eng.in_weights(), dense_A.sum(axis=1))


def test_block_build_resume(ctx500, tmp_path):
    """Second build with an existing complete manifest must not reshuffle."""
    from combblas_ray.core.engine import build_blocks

    g = ctx500.graph("directed")
    d = str(tmp_path / "blk")
    man1 = build_blocks(g, 2, d)
    import os

    mtimes = {b["path"]: os.path.getmtime(b["path"]) for b in man1["blocks"]}
    man2 = build_blocks(g, 2, d)
    assert man1 == man2
    for b in man2["blocks"]:
        assert os.path.getmtime(b["path"]) == mtimes[b["path"]]


def test_spmspv_matches_dense(ctx500, dense_A):
    eng = ctx500.engine("directed", g=2)
    n = ctx500.n
    idx = np.array([1, 10, 100, 250, 499], dtype=np.int64)
    xv = np.array([2.0, 1.0, 5.0, 3.0, 4.0])
    x = np.zeros(n)
    x[idx] = xv
    expect = dense_A @ x
    ui, uv = eng.spmspv(idx, xv, "plus_times")
    y = np.zeros(n)
    y[ui] = uv
    assert np.allclose(y, expect)
    # min_plus agreement between sparse and dense plans (cross-kernel
    # agreement, MultTest.cpp:199-208)
    xm = np.full(n, np.inf)
    xm[idx] = xv
    dense_min = eng.spmv(xm, "min_plus")
    ui2, uv2 = eng.spmspv(idx, xv, "min_plus")
    ym = np.full(n, np.inf)
    ym[ui2] = uv2
    assert np.array_equal(ym, dense_min)


def test_spmv_filtered_matches_dense(ctx500):
    """Edge-predicate SpMV (FilteredBFS semantics) vs dense filter."""
    import numpy as np

    from .conftest import brute_dense_matrix

    eng = ctx500.engine("sssp", g=2)
    A = brute_dense_matrix(ctx500)
    # rebuild sssp weights in dense form: len = 1 + (au + 2*av) % 7
    arith = ctx500.arith
    n = ctx500.n
    L = np.zeros((n, n))
    nz = np.nonzero(A)
    L[nz] = 1 + (arith[nz[1]] + 2 * arith[nz[0]]) % 7
    x = ((np.arange(n) * 3) % 5).astype(np.float64)
    got = eng.spmv_filtered(x, "plus_times", "le", 3.0)
    M = np.where(L <= 3.0, L, 0.0)
    assert np.allclose(got, M @ x)
    # repeated call uses the cached filtered view (same result)
    got2 = eng.spmv_filtered(x, "plus_times", "le", 3.0)
    assert np.array_equal(got, got2)


def test_block_rebuild_after_lost_file(ctx500, tmp_path):
    """Lineage robustness: deleting a block file invalidates the manifest
    and the next build regenerates it identically."""
    import os

    from combblas_ray.core.engine import build_blocks

    g = ctx500.graph("directed")
    d = str(tmp_path / "blk2")
    man1 = build_blocks(g, 2, d)
    victim = man1["blocks"][1]["path"]
    os.remove(victim)
    man2 = build_blocks(g, 2, d)
    assert os.path.exists(victim)
    assert [b["sha"] for b in man2["blocks"]] == [b["sha"] for b in man1["blocks"]]


def test_distributed_gather_scatter(ctx500):
    rng = np.random.RandomState(0)
    n = ctx500.n
    eng = ctx500.engine("sym", g=4)
    vals = rng.rand(n)
    idx = rng.randint(0, n, size=n)
    got = eng.gather(vals, idx)
    assert np.array_equal(got, vals[idx])
    # scatter-min with conflicts
    tgt = rng.randint(0, n, size=2 * n)
    sv = rng.rand(2 * n)
    out = eng.scatter_reduce(tgt, sv, "select2nd_min")
    ref = np.full(n, np.inf)
    np.minimum.at(ref, tgt, sv)
    assert np.array_equal(out, ref)


def test_incremental_block_update(ctx500, tmp_path, ray_session):
    """Merging a delta into the block store must equal a full rebuild of
    the unioned edge set, and untouched blocks must not be rewritten."""
    import os

    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import build_blocks, update_blocks
    from combblas_ray.core.graph import Graph

    g = ctx500.graph("directed")
    n = ctx500.n
    d1 = str(tmp_path / "inc")
    man = build_blocks(g, 4, d1)
    mtimes = {b["bid"]: os.path.getmtime(b["path"]) for b in man["blocks"]}

    # delta touching only low-id dst region (block rows 0)
    delta_tbl = pa.table(
        {
            "src": pa.array([5, 10, 400], type=pa.int64()),
            "dst": pa.array([3, 3, 7], type=pa.int64()),
            "w": pa.array([2.0, 1.0, 5.0]),
        }
    )
    delta = Graph(n=n, edges=ray.data.from_arrow(delta_tbl))
    man2 = update_blocks(man, delta, d1)

    # reference: full rebuild of union
    d2 = str(tmp_path / "full")
    union = Graph(n=n, edges=g.edges.union(ray.data.from_arrow(delta_tbl)))
    man3 = build_blocks(union, 4, d2)
    assert {b["bid"]: b["sha"] for b in man2["blocks"]} == {
        b["bid"]: b["sha"] for b in man3["blocks"]
    }
    # only delta-touched blocks rewritten
    touched = {b["bid"] for b in man2["blocks"]
               if os.path.getmtime(b["path"]) != mtimes.get(b["bid"])}
    expect_touched = set()
    from combblas_ray.core.partition import owner

    import numpy as np

    for s, dd in [(5, 3), (10, 3), (400, 7)]:
        expect_touched.add(int(owner(dd, n, 4)) * 4 + int(owner(s, n, 4)))
    assert touched == expect_touched


def test_uint16_boundary_block(ray_session, tmp_path):
    """Blocks with exactly 2^16 local rows/cols: index 65535 must survive
    the uint16 storage (wraparound regression test)."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph

    n = 131072  # g=2 -> 65536-wide chunks, local indices up to 65535
    edges = pa.table(
        {
            "src": pa.array([65535, 0, 131071, 65536], type=pa.int64()),
            "dst": pa.array([0, 65535, 65536, 131071], type=pa.int64()),
            "w": pa.array([2.0, 3.0, 4.0, 5.0]),
        }
    )
    g = Graph(n=n, edges=ray.data.from_arrow(edges))
    eng = SpmvEngine.from_graph(g, 2, str(tmp_path / "u16"))
    x = np.zeros(n)
    x[65535] = 1.0
    x[131071] = 10.0
    y = eng.spmv(x, "plus_times")
    assert y[0] == 2.0 and y[65536] == 40.0 and y[131071] == 0.0
    x2 = np.zeros(n)
    x2[0] = 1.0
    x2[65536] = 1.0
    y2 = eng.spmv(x2, "plus_times")
    assert y2[65535] == 3.0 and y2[131071] == 5.0
    # sparse path across the boundary
    ui, uv = eng.spmspv(
        np.array([0, 65536], dtype=np.int64), np.array([1.0, 1.0]), "plus_times"
    )
    got = dict(zip(ui.tolist(), uv.tolist()))
    assert got == {65535: 3.0, 131071: 5.0}
    eng.shutdown()


def test_incremental_update_preserves_structural_dtype(tmp_path, ray_session):
    """Delta merge on a structural=True / f4 store must keep w=1 presence
    semantics and float32 dtype, and must write a NEW generation file
    (replay idempotence) instead of mutating the old block in place."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import build_blocks, update_blocks
    from combblas_ray.core.graph import Graph

    def mk(edges, n=10):
        t = pa.table(
            {
                "src": pa.array([e[0] for e in edges], type=pa.int64()),
                "dst": pa.array([e[1] for e in edges], type=pa.int64()),
                "w": pa.array([float(e[2]) for e in edges]),
            }
        )
        return Graph(n=n, edges=ray.data.from_arrow(t))

    d = str(tmp_path / "inc_struct")
    man = build_blocks(mk([(0, 1, 5.0), (1, 2, 3.0)]), 2, d,
                       structural=True, w_dtype="f4")
    old_paths = {b["bid"]: b["path"] for b in man["blocks"]}
    man2 = update_blocks(man, mk([(0, 1, 7.0), (3, 4, 2.0)]), d)
    assert man2["gen"] == 1
    touched = 0
    for b in man2["blocks"]:
        z = np.load(b["path"])
        assert z["w"].dtype == np.float32
        assert (z["w"] == 1.0).all()  # presence-only, not summed weights
        if b["path"] != old_paths.get(b["bid"]):
            touched += 1
            assert "_g1" in b["path"]
    assert touched >= 1


def test_checkpoint_shape_guard(tmp_path, ray_session):
    """load_latest must skip sha-valid snapshots whose chunking disagrees
    with the caller's engine (stale dir from another n/g config)."""
    import ray

    from combblas_ray.state.checkpoint import load_latest, save_state

    cd = str(tmp_path / "ck")
    save_state(cd, "cc", 5, [ray.put(np.ones(7)), ray.put(np.ones(7))])
    assert load_latest(cd, "cc", expected_sizes=[9, 9]) == (0, None)
    assert load_latest(cd, "cc", expected_sizes=[7, 7, 7]) == (0, None)
    it, chunks = load_latest(cd, "cc", expected_sizes=[7, 7])
    assert it == 5 and chunks is not None


def test_ewise_apply_nan_is_not_null(ray_session):
    """A legitimate NaN weight must reach fn as NaN; only a truly missing
    join side gets the a_null/b_null substitute (Arrow null validity, not
    isnan — reference EWiseApply's explicit nullity)."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.spgemm import ewise_apply

    A = ray.data.from_arrow(pa.table(
        {"src": pa.array([0, 1], type=pa.int64()),
         "dst": pa.array([0, 1], type=pa.int64()),
         "w": pa.array([np.nan, 2.0])}))
    B = ray.data.from_arrow(pa.table(
        {"src": pa.array([0, 2], type=pa.int64()),
         "dst": pa.array([0, 2], type=pa.int64()),
         "w": pa.array([5.0, 7.0])}))

    def fn(wa, wb):
        return np.where(np.isnan(wa), -99.0, wa + wb)

    rows = {(r["src"], r["dst"]): r["w"]
            for r in ewise_apply(A, B, 10, fn, a_null=0.0, b_null=0.0,
                                 num_partitions=2).take_all()}
    assert rows[(0, 0)] == -99.0          # NaN preserved into fn
    assert rows[(1, 1)] == 2.0            # missing B side -> b_null=0
    assert rows[(2, 2)] == 7.0            # missing A side -> a_null=0


def test_spgemm_phased_equals_unphased(ctx500, ray_session):
    """Memory-phased SpGEMM (MemEfficientSpGEMM, ParFriends.h:452-779):
    forced >1 phases must produce the identical product."""
    from combblas_ray.core.spgemm import spgemm, spgemm_phased

    n = ctx500.n
    ref = {
        (r["src"], r["dst"]): r["w"]
        for r in spgemm(ctx500.edges, ctx500.edges, n,
                        num_partitions=4).take_all()
    }
    C, phases = spgemm_phased(ctx500.edges, ctx500.edges, n, phases=3,
                              num_partitions=4)
    assert phases == 3
    got = {(r["src"], r["dst"]): r["w"] for r in C.take_all()}
    assert got == ref


def test_spgemm_phase_estimator(ctx500, ray_session):
    """The flop estimator drives the phase count: a tiny budget must
    force >1 phases, a huge one exactly 1."""
    from combblas_ray.core.spgemm import estimate_flop, spgemm_phased

    n = ctx500.n
    flops = estimate_flop(ctx500.edges, ctx500.edges, n)
    assert flops > 0
    _, p_small = spgemm_phased(ctx500.edges, ctx500.edges, n,
                               per_process_memory=64, num_partitions=4,
                               max_phases=4)
    assert p_small > 1
    _, p_big = spgemm_phased(ctx500.edges, ctx500.edges, n,
                             per_process_memory=8 << 30, num_partitions=4)
    assert p_big == 1


def test_prune_column_vec(ctx500, ray_session):
    """PruneColumn(pvals, lt) keeps exactly the per-column maxima
    (dcsc.cpp:759-838 semantics: drop where op(w, pvals[col]) is true)."""
    g = ctx500.graph("directed")
    rows = g.reduce("row", "max").take_all()
    pvals = np.zeros(ctx500.n)
    for r in rows:
        pvals[int(r["v"])] = r["val"]
    kept = g.prune_column(pvals, "lt").edges.take_all()
    assert kept
    for r in kept:
        assert r["w"] >= pvals[r["src"]]
    # every column that had nonzeros retains at least its max
    srcs = {r["src"] for r in kept}
    assert srcs == {r["src"] for r in g.edges.take_all()}


def test_prune_column_by_index(ctx500, ray_session):
    g = ctx500.graph("directed")
    cols = np.arange(0, ctx500.n, 7)
    kept = g.prune_column_by_index(cols).edges.take_all()
    dropped = set(cols.tolist())
    assert kept
    assert all(r["src"] not in dropped for r in kept)
    before = g.edges.count()
    in_cols = sum(1 for r in g.edges.take_all() if r["src"] in dropped)
    assert len(kept) == before - in_cols


def test_block_store_relocation(ctx500, tmp_path, ray_session):
    """The block store is relocatable: build under one dir, MOVE the dir,
    resume from the new location — same shas, working engine (multi-node
    shared-fs portability; round-1 stores were pinned to absolute
    paths)."""
    import shutil

    from combblas_ray.core.engine import (
        SpmvEngine,
        build_blocks,
        load_manifest,
    )

    g = ctx500.graph("directed")
    d1 = str(tmp_path / "store_a")
    man1 = build_blocks(g, 2, d1)
    shas1 = {b["bid"]: b["sha"] for b in man1["blocks"]}
    d2 = str(tmp_path / "store_b")
    shutil.move(d1, d2)
    man2 = load_manifest(d2)
    assert {b["bid"]: b["sha"] for b in man2["blocks"]} == shas1
    assert all(b["path"].startswith(d2) for b in man2["blocks"])
    # resume via build_blocks on the new dir must NOT reshuffle
    man3 = build_blocks(g, 2, d2)
    assert {b["bid"]: b["sha"] for b in man3["blocks"]} == shas1
    eng = SpmvEngine.from_manifest(man2)
    y = eng.spmv(np.ones(ctx500.n), "plus_times")
    assert y.sum() > 0
    eng.shutdown()


def test_ewise_scale_dense_and_functional(ctx500, ray_session):
    """EWiseScale(DenseParMat) (SpParMat.cpp:2830): ndarray-broadcast and
    functional forms must agree and equal the per-entry product."""
    n = ctx500.n
    g = ctx500.graph("directed")
    D = ((np.add.outer(np.arange(n), 2 * np.arange(n)) % 7) + 1).astype(float)
    a = {(r["src"], r["dst"]): r["w"]
         for r in g.ewise_scale(D).edges.take_all()}
    b = {(r["src"], r["dst"]): r["w"]
         for r in g.ewise_scale(
             lambda dst, src: (dst + 2 * src) % 7 + 1).edges.take_all()}
    base = {(r["src"], r["dst"]): r["w"] for r in g.edges.take_all()}
    assert a == b
    for (s, d), w in base.items():
        assert a[(s, d)] == w * (((d + 2 * s) % 7) + 1)


def test_payload_combine_policies():
    """Struct-nonzero duplicate combine (TwitterEdge.h:36-42): per-field
    sum/or/max/min/first over (row, col) duplicate groups."""
    import numpy as np

    from combblas_ray.core.engine import _payload_combine

    key = np.array([3, 1, 3, 1, 7])
    vals = np.array([2, 5, 4, 1, 9], dtype=np.int64)
    uk, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
    assert uk.tolist() == [1, 3, 7]
    assert _payload_combine(vals, first_idx, inv, "sum").tolist() == [6, 6, 9]
    assert _payload_combine(vals, first_idx, inv, "max").tolist() == [5, 4, 9]
    assert _payload_combine(vals, first_idx, inv, "min").tolist() == [1, 2, 9]
    b = np.array([1, 0, 0, 1, 0], dtype=np.int8)
    assert _payload_combine(b, first_idx, inv, "or").tolist() == [1, 1, 0]
    assert _payload_combine(b, first_idx, inv, "and").tolist() == [0, 0, 0]
    f = _payload_combine(vals, first_idx, inv, "first")
    assert f[0] in (5, 1) and f[1] in (2, 4) and f[2] == 9


def test_payload_filtered_spmv_matches_scalar_prefilter(ctx500):
    """Payload-field predicate SpMV == SpMV on the manually pre-filtered
    dense matrix (FilteredBFS.cpp:107-110 Twitter predicate equivalence:
    cnt > 0 AND latest >= 300 over struct nonzeros)."""
    import numpy as np

    from .conftest import brute_dense_matrix

    eng = ctx500.engine("payload", g=2)
    A = brute_dense_matrix(ctx500)
    arith = ctx500.arith
    n = ctx500.n
    nz = np.nonzero(A)
    a_s, a_d = arith[nz[1]], arith[nz[0]]  # A[dst, src] layout
    keep = (((a_s * 7 + a_d) % 5) > 0) & (((a_s + 2 * a_d) % 1000) >= 300)
    M = np.zeros((n, n))
    M[nz[0][keep], nz[1][keep]] = A[nz[0][keep], nz[1][keep]]
    x = ((np.arange(n) * 5) % 7 + 1).astype(np.float64)
    got = eng.spmv_filtered(
        x, "plus_times", spec=(("cnt", "gt", 0), ("latest", "ge", 300))
    )
    assert np.allclose(got, M @ x)
    # single-field payload predicate too
    keep1 = ((a_s + 2 * a_d) % 1000) >= 300
    M1 = np.zeros((n, n))
    M1[nz[0][keep1], nz[1][keep1]] = A[nz[0][keep1], nz[1][keep1]]
    got1 = eng.spmv_filtered(x, "plus_times", spec=(("latest", "ge", 300),))
    assert np.allclose(got1, M1 @ x)


def test_incremental_payload_blocks(tmp_path, ray_session):
    """Round-4: merging a delta into a PAYLOAD-typed block store must
    equal a full rebuild of the unioned edge set, per-field combines
    included (`Applications/Incremental` over struct nonzeros,
    `TwitterEdge.h:36-42` operator+= semantics)."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import build_blocks, update_blocks
    from combblas_ray.core.graph import Graph

    spec = {"follower": "or", "cnt": "sum", "latest": "max"}

    def mk(rows, n=10):
        t = pa.table({
            "src": pa.array([r[0] for r in rows], type=pa.int64()),
            "dst": pa.array([r[1] for r in rows], type=pa.int64()),
            "w": pa.array([float(r[2]) for r in rows]),
            "follower": pa.array([r[3] for r in rows], type=pa.int8()),
            "cnt": pa.array([r[4] for r in rows], type=pa.int32()),
            "latest": pa.array([r[5] for r in rows], type=pa.int64()),
        })
        return Graph(n=n, edges=ray.data.from_arrow(t))

    base = [(0, 1, 1.0, 1, 2, 100), (1, 2, 1.0, 0, 3, 50),
            (4, 5, 2.0, 0, 1, 10)]
    delta = [(0, 1, 1.0, 0, 4, 700),  # coincides: or/sum/max combine
             (7, 8, 1.0, 1, 1, 5)]    # new edge, untouched block region
    d1 = str(tmp_path / "pinc")
    man = build_blocks(mk(base), 2, d1, payload=spec)
    man2 = update_blocks(man, mk(delta), d1)

    d2 = str(tmp_path / "pfull")
    man3 = build_blocks(mk(base + delta), 2, d2, payload=spec)

    def block_dict(man_):
        out = {}
        for b in man_["blocks"]:
            z = np.load(b["path"])
            out[b["bid"]] = {
                k: z[k].tolist()
                for k in ("rows", "cols", "w", "p_follower", "p_cnt",
                          "p_latest")
            }
        return out

    assert block_dict(man2) == block_dict(man3)

    # filtered BFS (payload-predicate SpMV) over the incrementally
    # updated store equals the rebuilt store
    from combblas_ray.core.engine import SpmvEngine

    e_inc = SpmvEngine.from_manifest(man2)
    e_full = SpmvEngine.from_manifest(man3)
    spec = (("cnt", "gt", 1), ("latest", "ge", 50))
    x = np.zeros(10)
    x[0] = 1.0
    for _ in range(3):
        y_inc = e_inc.spmv_filtered(x, "bool_or_and", spec=spec)
        y_full = e_full.spmv_filtered(x, "bool_or_and", spec=spec)
        assert np.array_equal(y_inc, y_full)
        x = np.maximum(x, y_inc)
    e_inc.shutdown()
    e_full.shutdown()

    # delta missing a payload column fails loudly
    bad = Graph(n=10, edges=ray.data.from_arrow(pa.table({
        "src": pa.array([1], type=pa.int64()),
        "dst": pa.array([2], type=pa.int64()),
        "w": pa.array([1.0]),
    })))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="payload"):
        update_blocks(man2, bad, d1)


def test_object_store_only_engine(ctx500, ray_session):
    """build_block_refs + from_block_refs (no filesystem anywhere) must
    agree with the disk-checkpointed engine on dense SpMV, SpMSpV, SpMM
    and fused reductions — the no-shared-FS multi-node path."""
    from combblas_ray.core.engine import SpmvEngine, build_block_refs

    g = ctx500.graph("directed")
    entries = build_block_refs(g, 3)
    eng_obj = SpmvEngine.from_block_refs(ctx500.n, 3, entries)
    eng_disk = ctx500.engine("directed", 3)
    n = ctx500.n
    x = ((np.arange(n) * 7) % 11 + 1).astype(np.float64)
    assert np.array_equal(eng_obj.spmv(x, "plus_times"),
                          eng_disk.spmv(x, "plus_times"))
    assert np.array_equal(eng_obj.spmv(x, "min_plus"),
                          eng_disk.spmv(x, "min_plus"))
    si = np.array([0, 5, 17], dtype=np.int64)
    a = eng_obj.spmspv(si, np.ones(3), "plus_times")
    b = eng_disk.spmspv(si, np.ones(3), "plus_times")
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    X = np.stack([x, 2 * x])
    assert np.array_equal(eng_obj.spmm(X, "plus_times"),
                          eng_disk.spmm(X, "plus_times"))
    assert np.array_equal(eng_obj.out_weights(), eng_disk.out_weights())
    assert eng_obj.manifest["store"] == "object"
    assert eng_obj.nnz() == eng_disk.nnz()
    eng_obj.shutdown()


def test_actor_restart_fault_tolerance(ctx500, tmp_path, ray_session):
    """max_restarts engines survive an actor death mid-run (the
    multi-node node-loss case): Ray replays __init__ (blocks reload
    from the checkpointed disk store) and max_task_retries re-submits
    the in-flight partials — SpMV results identical before and after a
    kill, with NO driver-side handling. dim_apply refuses on a
    restartable engine (a restart would silently revert the in-place
    scaling)."""
    import pytest

    import ray

    from combblas_ray.core.engine import SpmvEngine, build_blocks

    g = ctx500.graph("directed")
    man = build_blocks(g, 3, str(tmp_path / "ft_store"))
    eng = SpmvEngine.from_manifest(man, max_restarts=2)
    assert eng.restartable
    n = ctx500.n
    x = ((np.arange(n) * 13) % 7 + 1).astype(np.float64)
    base = eng.spmv(x, "plus_times")
    # kill one actor; no_restart=False lets Ray respawn it
    ray.kill(eng.actors[0], no_restart=False)
    y = eng.spmv(x, "plus_times")  # retries ride max_task_retries
    assert np.array_equal(y, base)
    # a second kill mid-sequence, then SpMM and fused sums still agree
    ray.kill(eng.actors[-1], no_restart=False)
    X = np.stack([x, 3 * x])
    disk = ctx500.engine("directed", 3)
    assert np.array_equal(eng.spmm(X, "plus_times"),
                          disk.spmm(X, "plus_times"))
    assert np.array_equal(eng.out_weights(), disk.out_weights())
    with pytest.raises(NotImplementedError):
        eng.dim_apply("col", np.ones(n))
    eng.shutdown()


def test_actor_restart_object_store_refs(ctx500, ray_session):
    """Restartable engines also work in object-store-only mode: the
    constructor args are driver-owned block refs, which outlive the
    actor, so the replayed __init__ re-fetches them."""
    import ray

    from combblas_ray.core.engine import SpmvEngine, build_block_refs

    g = ctx500.graph("directed")
    entries = build_block_refs(g, 2)
    eng = SpmvEngine.from_block_refs(ctx500.n, 2, entries, max_restarts=1)
    x = np.ones(ctx500.n)
    base = eng.spmv(x, "plus_times")
    ray.kill(eng.actors[0], no_restart=False)
    assert np.array_equal(eng.spmv(x, "plus_times"), base)
    eng.shutdown()
