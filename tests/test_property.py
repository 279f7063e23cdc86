"""Property-based tests (hypothesis): random small graphs vs dense/numpy
oracles — the reference's cross-kernel agreement strategy taken further.

Only raw-task plans run per example (Ray Data's join/shuffle operators
pay ~5s of actor spawn per round, which would swamp a property suite);
the join plans get ONE example-based agreement check at the end, which
also regression-tests the empty-block schema guard on tiny inputs.
"""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

import ray


def _graph_from_edges(edges, n):
    from combblas_ray.core.graph import Graph

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], type=pa.int64()),
            "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            "w": pa.array([float(e[2]) for e in edges], type=pa.float64()),
        }
    )
    return Graph(n=n, edges=ray.data.from_arrow(t))


def _edges_strategy(nmax=24, wmax=4):
    return st.integers(4, nmax).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(1, wmax),
                ),
                min_size=1,
                max_size=4 * n,
            ),
        )
    )


_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(_edges_strategy())
def test_spgemm_tasks_matches_dense_matmul(ray_session, data):
    """Raw-task spgemm == dense matmul under the M[dst,src] compose
    convention, on arbitrary random integer matrices (incl. duplicates,
    self-loops, hub rows)."""
    from combblas_ray.core.spgemm import spgemm_tasks

    n, edges = data
    g = _graph_from_edges(edges, n).dedup_sum()
    A = np.zeros((n, n))
    for r in g.edges.take_all():
        A[r["dst"], r["src"]] = r["w"]
    C_ref = A @ A
    got = np.zeros((n, n))
    for r in spgemm_tasks(g.edges, g.edges, n, num_partitions=2).take_all():
        got[r["dst"], r["src"]] = r["w"]
    assert np.allclose(got, C_ref)


@settings(**_SETTINGS)
@given(_edges_strategy(nmax=20))
def test_triangle_plans_match_brute(ray_session, data):
    import combblas_ray.pipelines.algorithms as alg

    n, edges = data
    # raw directed edges (dups + loops): triangle_count dedups and
    # symmetrizes internally via its distinct-pair stage
    g = _graph_from_edges(edges, n)
    U = np.zeros((n, n), dtype=bool)
    for s, d, _w in edges:
        if s != d:
            U[s, d] = True
            U[d, s] = True
    brute = int(np.trace(np.linalg.matrix_power(U.astype(np.int64), 3)) // 6)
    cb = alg.triangle_count(g.edges, n, method="broadcast", num_partitions=2)
    cj = alg.triangle_count(g.edges, n, method="join", num_partitions=2)
    assert cb == brute
    assert cj == brute


@settings(**_SETTINGS)
@given(_edges_strategy(nmax=20))
def test_prune_column_keeps_only_qualifying(ray_session, data):
    n, edges = data
    g = _graph_from_edges(edges, n).dedup_sum()
    pvals = np.full(n, 2.0)
    kept = g.prune_column(pvals, "lt").edges.take_all()
    base = g.edges.take_all()
    assert {(r["src"], r["dst"]) for r in kept} == {
        (r["src"], r["dst"]) for r in base if r["w"] >= 2.0
    }


@settings(**_SETTINGS)
@given(_edges_strategy(nmax=16))
def test_ewise_scale_matches_oracle(ray_session, data):
    n, edges = data
    g = _graph_from_edges(edges, n).dedup_sum()
    got = {(r["src"], r["dst"]): r["w"]
           for r in g.ewise_scale(
               lambda dst, src: (dst + src) % 3 + 1).edges.take_all()}
    for r in g.edges.take_all():
        k = (r["src"], r["dst"])
        assert got[k] == r["w"] * ((r["dst"] + r["src"]) % 3 + 1)


def test_join_plan_agrees_on_tiny_sparse_input(ray_session):
    """ONE example-based check of the Ray-Data-join spgemm on a tiny
    graph whose hash shuffle produces empty partitions — regression for
    the empty-block schema guard (ArrowInvalid 'No match for key field'
    before the guard)."""
    from combblas_ray.core.spgemm import spgemm, spgemm_tasks

    n, edges = 5, [(0, 1, 1), (1, 2, 2), (2, 0, 3), (4, 4, 1)]
    g = _graph_from_edges(edges, n).dedup_sum()
    a = sorted(
        (r["src"], r["dst"], r["w"])
        for r in spgemm(g.edges, g.edges, n, num_partitions=2).take_all()
    )
    b = sorted(
        (r["src"], r["dst"], r["w"])
        for r in spgemm_tasks(g.edges, g.edges, n, num_partitions=2).take_all()
    )
    assert a == b and a


@settings(**_SETTINGS)
@given(_edges_strategy(nmax=20))
def test_clustering_coefficients_match_brute(ray_session, data):
    """Per-vertex triangle counts + degrees == dense diag(B^3)/2 and row
    sums, on arbitrary random graphs (dups + loops dedup internally)."""
    import combblas_ray.pipelines.algorithms as alg

    n, edges = data
    g = _graph_from_edges(edges, n)
    U = np.zeros((n, n), dtype=np.int64)
    for s, d, _w in edges:
        if s != d:
            U[s, d] = U[d, s] = 1
    t = alg.clustering_coefficients(g.edges, n, num_partitions=2)
    deg = np.zeros(n, dtype=np.int64)
    tri = np.zeros(n, dtype=np.int64)
    v = np.asarray(t.column("v"))
    deg[v] = np.asarray(t.column("deg"))
    tri[v] = np.asarray(t.column("tri"))
    assert np.array_equal(deg, U.sum(axis=1))
    assert np.array_equal(tri, np.diag(U @ U @ U) // 2)


@settings(**_SETTINGS)
@given(_edges_strategy(nmax=18), st.integers(3, 5), st.integers(1, 3))
def test_ktruss_matches_brute_peel(ray_session, data, k, rounds):
    """Fixed-round k-truss == brute synchronous edge peel for random
    graphs and arbitrary (k, rounds)."""
    import combblas_ray.pipelines.algorithms as alg

    n, edges = data
    g = _graph_from_edges(edges, n)
    cur = {(min(s, d), max(s, d)) for s, d, _w in edges if s != d}
    for _ in range(rounds):
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        cur = {(a, b) for a, b in cur if len(adj[a] & adj[b]) >= k - 2}
    keys = alg.ktruss_fixed(g.edges, n, k, rounds, num_partitions=2)
    got = {(int(x // n), int(x % n)) for x in keys}
    assert got == cur
