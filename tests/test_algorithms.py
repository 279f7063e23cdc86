import numpy as np

from combblas_ray.pipelines import algorithms as alg

from .conftest import brute_dense_matrix


def _und_adj(A):
    U = ((A + A.T) > 0).astype(np.float64)
    np.fill_diagonal(U, 0)
    return U


def test_cc_matches_union_find(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und_adj(A)
    n = ctx500.n
    # brute union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(U)):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    ref = np.array([find(i) for i in range(n)])
    # min-relabel per component
    labels, it = alg.connected_components(ctx500.engine("sym", g=2))
    # same partition: labels equal iff ref equal
    m1, m2 = {}, {}
    for a, b in zip(labels, ref):
        m1.setdefault(a, set()).add(b)
        m2.setdefault(b, set()).add(a)
    assert all(len(v) == 1 for v in m1.values())
    assert all(len(v) == 1 for v in m2.values())
    # and the representative IS the min vertex of the component
    assert np.array_equal(labels, ref)


def test_cc_fixed_converged(ctx500):
    """12 fixed rounds must equal the converged answer at this scale (the
    oracle-parity iteration count is validated here)."""
    eng = ctx500.engine("sym", g=2)
    fixed = alg.cc_fixed(eng, 12)
    more = alg.cc_fixed(eng, 13)
    assert np.array_equal(fixed, more)


def test_bfs_matches_brute(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und_adj(A)
    n = ctx500.n
    root = int(np.searchsorted(ctx500.labels, "m_0"))
    # brute BFS
    from collections import deque

    dist = np.full(n, np.inf)
    dist[root] = 0
    dq = deque([root])
    adj = [np.nonzero(U[:, v])[0] for v in range(n)]  # neighbors (sym)
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if dist[v] == np.inf:
                dist[v] = dist[u] + 1
                dq.append(v)
    d = alg.min_plus_distances(ctx500.engine("sym", g=2), root, iters=12)
    assert np.array_equal(d, dist)


def test_triangles_match_brute(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und_adj(A)
    expect = int(np.trace(U @ U @ U) // 6)
    got = alg.triangle_count(ctx500.graph("sym").edges, ctx500.n)
    assert got == expect
    got_join = alg.triangle_count(
        ctx500.graph("sym").edges, ctx500.n, method="join", num_partitions=4
    )
    assert got_join == expect


def test_label_propagation_matches_brute(ctx500):
    A = brute_dense_matrix(ctx500)
    U = _und_adj(A)
    n = ctx500.n
    init = (ctx500.arith % 10).astype(np.int64)
    # brute: counts per class via matmul on indicators
    cls = init.copy()
    for _ in range(3):
        counts = np.stack([U @ (cls == c).astype(float) for c in range(10)])
        total = counts.sum(axis=0)
        best = counts.argmax(axis=0)
        cls = np.where(total > 0, best, cls)
    got = alg.label_propagation(ctx500.engine("sym", g=2), init, 10, 3)
    assert np.array_equal(got, cls)


def test_bfs_from_isolated_vertex(ray_session, tmp_path):
    """Isolated-root BFS: the fused merge+step tasks must handle an
    all-empty frontier on every chunk (no partials at all)."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph

    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 1], type=pa.int64()),
                  "dst": pa.array([1, 2], type=pa.int64()),
                  "w": pa.array([1.0, 1.0])})
    )
    eng = SpmvEngine.from_graph(
        Graph(n=6, edges=ds), 2, str(tmp_path / "iso"), resume=False
    )
    parents, dist = alg.bfs_parents(eng, 5)
    assert parents[5] == 5
    others = np.arange(6) != 5
    assert (parents[others] == -1).all()
    d = alg.bfs_distances_auto(eng, 5)
    assert d[5] == 0
    assert np.isinf(d[others]).all()
    eng.shutdown()
