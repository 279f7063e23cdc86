import numpy as np

from combblas_ray.pipelines import algorithms as alg

from .conftest import brute_dense_matrix


def _und(A):
    U = ((A + A.T) > 0).astype(np.float64)
    np.fill_diagonal(U, 0)
    return U


def test_bfs_parents_valid_tree(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und(A)
    root = int(np.searchsorted(ctx500.labels, "m_0"))
    parents, dist = alg.bfs_parents(ctx500.engine("sym", g=2), root)
    # distances must match dense min-plus BFS
    ref = alg.min_plus_distances(ctx500.engine("sym", g=2), root, iters=12)
    got = np.where(dist < 0, np.inf, dist.astype(np.float64))
    assert np.array_equal(got, ref)
    # every reached non-root vertex: parent one level closer, edge exists,
    # and parent is the MINIMUM id among previous-level neighbors
    for v in np.nonzero(dist > 0)[0]:
        p = parents[v]
        assert dist[p] == dist[v] - 1
        assert U[v, p] == 1 or U[p, v] == 1
        prev_nbrs = [u for u in np.nonzero(U[:, v] + U[v, :])[0]
                     if dist[u] == dist[v] - 1 and dist[u] >= 0]
        assert p == min(prev_nbrs)


def test_luby_mis_invariants(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und(A)
    mis = alg.luby_mis(ctx500.engine("sym", g=2))
    # independence: no edge inside the set
    sel = np.nonzero(mis)[0]
    assert U[np.ix_(sel, sel)].sum() == 0
    # maximality: every outside vertex has a neighbor in the set
    out = np.nonzero(~mis)[0]
    for v in out:
        assert U[v, sel].sum() + U[sel, v].sum() > 0


def test_rmat_deterministic_and_batch_invariant(ray_session):
    import ray

    from combblas_ray.sources.rmat import rmat_batch, rmat_dataset

    a = rmat_batch(np.arange(1000), 10)
    b = rmat_batch(np.arange(1000), 10)
    assert a.equals(b)
    # batching must not change output
    c1 = rmat_batch(np.arange(0, 500), 10)
    c2 = rmat_batch(np.arange(500, 1000), 10)
    import pyarrow as pa

    assert pa.concat_tables([c1, c2]).equals(a)
    ds = rmat_dataset(8, edgefactor=4)
    rows = ds.take_all()
    assert len(rows) == 4 * 256
    assert max(max(r["src"], r["dst"]) for r in rows) < 256
    # power-law-ish: top vertex degree well above average
    import collections

    deg = collections.Counter()
    for r in rows:
        deg[r["src"]] += 1
    assert max(deg.values()) > 4 * (len(rows) / 256)


def test_pagerank_invariant_under_relabeling(ctx500, tmp_path):
    """Skew-mitigation check (`RandPerm` semantics, FullyDistVec.cpp:784):
    permuting vertex ids must not change PageRank scores (up to the
    permutation) — validates that partitioning arithmetic carries no
    id-dependent bias."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines.pagerank import pagerank

    n = ctx500.n
    rng = np.random.RandomState(3)
    perm = rng.permutation(n).astype(np.int64)
    perm_ref = ray.put(perm)

    def _relabel(batch: pa.Table, *, _ref=perm_ref) -> pa.Table:
        p = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        return pa.table(
            {
                "src": pa.array(p[np.asarray(batch.column("src"))]),
                "dst": pa.array(p[np.asarray(batch.column("dst"))]),
                "w": batch.column("w"),
            }
        )

    g2 = Graph(n=n, edges=ctx500.edges.map_batches(_relabel, batch_format="pyarrow"))
    e2 = SpmvEngine.from_graph(g2, 2, str(tmp_path / "perm"))
    r2, _ = pagerank(e2, iters=8)
    r1, _ = pagerank(ctx500.engine("directed", g=2), iters=8)
    assert np.allclose(r2[perm], r1, rtol=1e-9, atol=1e-15)
    e2.shutdown()


def test_mcl_two_triangles(ray_session):
    import pyarrow as pa

    import ray

    from combblas_ray.pipelines.mcl import mcl

    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "w": pa.array([1.0] * len(src)),
            }
        )
    )
    labels, info = mcl(ds, 6)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    assert info["chaos"][-1] < 1e-3


def test_bfs_auto_plan_switch_matches_dense(ctx500):
    root = int(np.searchsorted(ctx500.labels, "m_0"))
    eng = ctx500.engine("sym", g=2)
    auto = alg.bfs_distances_auto(eng, root)
    ref = alg.min_plus_distances(eng, root, iters=12)
    assert np.array_equal(auto, ref)


def test_betweenness_matches_brute(ctx500):
    from combblas_ray.pipelines.betweenness import (
        betweenness_centrality,
        brute_betweenness,
    )

    A = brute_dense_matrix(ctx500)
    U = _und(A)
    sources = np.array([0, 7, 33, 100, 250], dtype=np.int64)
    got = betweenness_centrality(ctx500.engine("sym", g=2), sources)
    ref = brute_betweenness(U, sources)
    assert np.allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_spgemm_plans_agree(ctx500):
    """Shuffle-join plan vs broadcast plan must produce identical products
    (the reference's cross-kernel agreement strategy)."""
    from combblas_ray.core.spgemm import spgemm, spgemm_broadcast

    n = ctx500.n
    a = spgemm(ctx500.edges, ctx500.edges, n, num_partitions=4)
    b = spgemm_broadcast(ctx500.edges, ctx500.edges, n)
    ra = sorted((r["src"], r["dst"], r["w"]) for r in a.take_all())
    rb = sorted((r["src"], r["dst"], r["w"]) for r in b.take_all())
    assert ra == rb


def test_maximal_matching_valid(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und(A)
    m = alg.maximal_matching(ctx500.engine("sym", g=2))
    n = ctx500.n
    for v in range(n):
        if m[v] >= 0:
            assert m[m[v]] == v  # symmetric
            assert U[v, m[v]] == 1 or U[m[v], v] == 1  # real edge
    # maximality: no edge joins two unmatched vertices
    un = np.nonzero(m < 0)[0]
    assert U[np.ix_(un, un)].sum() == 0
    assert (m >= 0).sum() > 0


def test_rcm_reduces_bandwidth(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und(A)
    perm = alg.rcm_ordering(ctx500.engine("sym", g=2))
    n = ctx500.n
    assert sorted(perm.tolist()) == list(range(n))  # valid permutation
    i, j = np.nonzero(U)
    bw_before = int(np.abs(i - j).max())
    bw_after = int(np.abs(perm[i] - perm[j]).max())
    # mean |i-j| is the robust profile metric for the relaxed variant
    prof_before = float(np.abs(i - j).mean())
    prof_after = float(np.abs(perm[i] - perm[j]).mean())
    assert prof_after < prof_before


def test_cc_checkpoint_resume(ctx500, tmp_path):
    eng = ctx500.engine("sym", g=2)
    full, _ = alg.connected_components(eng)
    ck = str(tmp_path / "cc")
    # checkpoint every round, then resume from the snapshots
    r1, it1 = alg.connected_components(eng, ckpt_dir=ck, ckpt_every=1)
    r2, it2 = alg.connected_components(eng, ckpt_dir=ck, ckpt_every=1)
    assert np.array_equal(r1, full)
    assert np.array_equal(r2, full)
    # resumed from the converged snapshot: at most one verification round
    assert it2 <= it1 + 1


def test_fastsv_matches_cc(ctx500):
    eng = ctx500.engine("sym", g=2)
    ref, _ = alg.connected_components(eng)
    got, iters = alg.fastsv(eng)
    assert np.array_equal(got, ref)
    assert iters < 20


def test_auction_matching_optimal_on_dense(ray_session, tmp_path):
    import itertools

    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines.auction import auction_matching

    for trial in range(3):
        rng = np.random.RandomState(trial)
        n = 6
        W = rng.randint(1, 50, size=(n, n)).astype(np.float64)
        s_l, d_l, w_l = [], [], []
        for p in range(n):
            for o in range(n):
                s_l.append(o)
                d_l.append(p)
                w_l.append(W[p, o])
        ds = ray.data.from_arrow(
            pa.table({"src": pa.array(s_l, type=pa.int64()),
                      "dst": pa.array(d_l, type=pa.int64()),
                      "w": pa.array(w_l)})
        )
        eng = SpmvEngine.from_graph(
            Graph(n=n, edges=ds), 2, str(tmp_path / f"a{trial}"), resume=False
        )
        p2o, price, info = auction_matching(eng, eps=1e-4)
        got = sum(W[p, p2o[p]] for p in range(n) if p2o[p] >= 0)
        best = max(
            sum(W[p, perm[p]] for p in range(n))
            for perm in itertools.permutations(range(n))
        )
        assert abs(got - best) < n * 1e-4 + 1e-9
        objs = [o for o in p2o if o >= 0]
        assert len(objs) == len(set(objs))
        eng.shutdown()


def test_auction_on_sparse_graph_valid(ctx500):
    from combblas_ray.pipelines.auction import auction_matching

    eng = ctx500.engine("sssp", g=2)
    p2o, price, info = auction_matching(eng, eps=1e-3)
    objs = [o for o in p2o if o >= 0]
    assert len(objs) == len(set(objs))  # each object once
    assert info["assigned"] > 0
    # assigned pairs must be real edges
    A = brute_dense_matrix(ctx500)
    for p in np.nonzero(p2o >= 0)[0]:
        assert A[p, p2o[p]] > 0


def test_incremental_mcl_matches_full_rerun(ray_session):
    """Incremental MCL (Applications/Incremental family): start from a
    clustered graph, add a THIRD triangle attached to the second one via
    a bridge; the incremental path re-clusters only the perturbed region
    and must equal a full re-run on the union (canonical min-id labels).
    """
    import pyarrow as pa

    import ray

    from combblas_ray.pipelines.mcl import mcl, mcl_incremental

    def sym_ds(und):
        src = [a for a, b in und] + [b for a, b in und]
        dst = [b for a, b in und] + [a for a, b in und]
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64()),
                    "w": pa.array([1.0] * len(src)),
                }
            )
        )

    base = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    delta = [(5, 6), (6, 7), (7, 8), (6, 8)]  # bridge + new triangle
    n = 9
    prev, _ = mcl(sym_ds(base), n)  # vertices 6-8 isolated singletons
    inc, info = mcl_incremental(sym_ds(base), prev, sym_ds(delta), n)
    full, _ = mcl(sym_ds(base + delta), n)
    assert np.array_equal(inc, full), (inc, full)
    # the first triangle must NOT have been re-clustered
    assert info["affected"] < n
    assert np.array_equal(inc[:3], prev[:3])

    # empty delta: previous clustering must stand, zero re-clustering
    empty = sym_ds([])
    same, info0 = mcl_incremental(sym_ds(base), prev, empty, n)
    assert info0["affected"] == 0
    assert np.array_equal(same, prev)


def test_maximum_matching_is_maximum(ctx500):
    """MS-BFS augmenting-path matching (BPMaximumMatching.h:231-420) must
    reach the exact maximum-cardinality size (vs augmenting-DFS oracle)
    and be a valid matching on the bipartite view."""
    import sys

    sys.setrecursionlimit(10000)
    edges = [(r["src"], r["dst"]) for r in ctx500.edges.take_all()]
    eng = ctx500.engine("directed", g=2)
    mate_col, mate_row = alg.maximum_matching(eng)
    # validity: involution + real edges
    eset = set(edges)
    for c in range(ctx500.n):
        if mate_col[c] >= 0:
            assert mate_row[mate_col[c]] == c
            assert (c, int(mate_col[c])) in eset
    size = int((mate_col >= 0).sum())
    assert size == alg.brute_max_matching_size(edges, ctx500.n)


def test_md_ordering_matches_brute(ray_session):
    """Minimum-degree ordering (MD.cpp:289-361) vs a pure-python oracle
    with identical tie-breaks, on the n=120 corpus graph."""
    from combblas_ray.pipelines.context import get_context_for_n

    from .conftest import brute_dense_matrix

    ctx = get_context_for_n(120)
    U = _und(brute_dense_matrix(ctx))
    got = alg.md_ordering(ctx.engine("sym", g=2))
    ref = alg.brute_md_ordering(U)
    assert np.array_equal(got, ref)


def test_md_ordering_refs_path_matches_brute(ray_session, monkeypatch):
    """Force the chunked-refs multisource BFS path (the at-scale plan)
    and assert it matches the brute MD oracle exactly."""
    import numpy as np

    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines.context import get_context_for_n
    from .conftest import brute_dense_matrix

    monkeypatch.setattr(alg, "MD_DENSE_MAX", 0)
    ctx = get_context_for_n(120)
    U = brute_dense_matrix(ctx)
    U = ((U + U.T) > 0).astype(float)
    np.fill_diagonal(U, 0.0)
    got = alg.md_ordering(ctx.engine("sym", g=2))
    ref = alg.brute_md_ordering(U)
    assert got.tolist() == ref.tolist()


def test_maximum_matching_refs_path_is_maximum(ctx500, monkeypatch):
    """Force the refs-only plan (chunked mate/parent/leaf state, the
    at-scale layout) and assert validity + exact maximum size."""
    import numpy as np

    from combblas_ray.pipelines import algorithms as alg

    monkeypatch.setattr(alg, "MM_DENSE_MAX", 0)
    edges = [(r["src"], r["dst"]) for r in ctx500.edges.take_all()]
    eng = ctx500.engine("directed", g=2)
    mate_col, mate_row = alg.maximum_matching(eng)
    eset = set(edges)
    for c in range(ctx500.n):
        if mate_col[c] >= 0:
            assert mate_row[mate_col[c]] == c
            assert (c, int(mate_col[c])) in eset
    size = int((mate_col >= 0).sum())
    assert size == alg.brute_max_matching_size(edges, ctx500.n)


def test_auction_refs_path_matches_dense(ctx500, monkeypatch):
    """Force the refs-only plan (chunked price/mate/active state, the
    at-scale layout); with order-independent tie-breaks it must be
    trace-identical to the dense driver path."""
    from combblas_ray.pipelines import auction as auc

    eng = ctx500.engine("sssp", g=2)
    p2o_d, price_d, info_d = auc.auction_matching(eng, eps=1e-3)
    monkeypatch.setattr(auc, "AUC_DENSE_MAX", 0)
    p2o_r, price_r, info_r = auc.auction_matching(eng, eps=1e-3)
    assert np.array_equal(p2o_d, p2o_r)
    assert np.allclose(price_d, price_r)
    assert info_d == info_r


def test_auction_refs_path_matches_dense_g3(ctx500, monkeypatch):
    """Uneven chunking (500 / 3) exercises the bounds arithmetic in the
    routed bid slices and the winner/evict apply."""
    from combblas_ray.pipelines import auction as auc

    eng = ctx500.engine("sssp", g=3)
    p2o_d, price_d, info_d = auc.auction_matching(eng, eps=1e-3)
    monkeypatch.setattr(auc, "AUC_DENSE_MAX", 0)
    p2o_r, price_r, info_r = auc.auction_matching(eng, eps=1e-3)
    assert np.array_equal(p2o_d, p2o_r)
    assert np.allclose(price_d, price_r)
    assert info_d == info_r


def test_auction_floor_quits_all(ctx500, monkeypatch):
    """floor above every weight: all bidders quit round 1 — exercises the
    kept==0 continue branch in the refs plan and the dense equivalent."""
    from combblas_ray.pipelines import auction as auc

    eng = ctx500.engine("sssp", g=2)
    p2o_d, _, info_d = auc.auction_matching(eng, eps=1e-3, floor=1e9)
    monkeypatch.setattr(auc, "AUC_DENSE_MAX", 0)
    p2o_r, _, info_r = auc.auction_matching(eng, eps=1e-3, floor=1e9)
    assert info_d["assigned"] == 0 and info_r["assigned"] == 0
    assert (p2o_d == -1).all() and (p2o_r == -1).all()
