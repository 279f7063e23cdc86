"""Brute twins for wave 88: Hutchinson trace estimator, k-truss peel
trace, EWMA daily anomaly flags."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_hutchinson_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    n = ctx.n
    src, dst = _und(ctx)
    ar = np.asarray(ctx.arith, dtype=np.int64)

    def spmv_i64(x):
        y = np.zeros((x.shape[0], n), dtype=np.int64)
        for p in range(x.shape[0]):
            np.add.at(y[p], src, x[p][dst])
        return y

    P = q.HUTCH_P
    key = (np.arange(1, P + 1, dtype=np.int64)[:, None] * np.int64(n)
           + ar[None, :])
    h1 = ((key % (1 << 20)) * np.int64(2654435761)
          + (key // (1 << 20)) * np.int64(40503)) % np.int64(1 << 32)
    h2 = ((h1 % (1 << 16)) * np.int64(48271)
          + h1 // (1 << 16)) % np.int64(1 << 32)
    z = (1 - 2 * ((h2 >> 16) % 2)).astype(np.int64)
    y = z
    for _ in range(3):
        y = spmv_i64(y)
    est = (z * y).sum(axis=1)

    got = q.q_hutchinson_trace(SF).to_pandas().sort_values("probe")
    assert np.array_equal(got.est.to_numpy(), est)
    means = np.cumsum(est) / np.arange(1, P + 1)
    assert np.allclose(got.mean_est.to_numpy(), np.round(means, 6))
    # Rademacher probes must be balanced-ish and the estimator unbiased:
    # E[est] = tr(A^3) = 6 * n_triangles >= 0 on an undirected graph
    assert abs(int(z.sum())) < z.size // 4


def test_hutchinson_mean_tracks_trace(ray_session):
    """The probe mean must sit near tr(A^3) (exactly 6x triangles)."""
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    n = ctx.n
    nbr = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        nbr[s].add(d)
    tr3 = sum(len(nbr[s] & nbr[d]) for s, d in zip(src, dst))
    got = q.q_hutchinson_trace(SF).to_pandas()
    mean = float(got.mean_est.iloc[-1])
    assert tr3 > 0
    # Sound bound: the Hutchinson concentration envelope, NOT a relative
    # error — per-probe std for ideal Rademacher is
    # sqrt(2*(||A^3||_F^2 - sum diag^2)), far larger than tr(A^3)=6*tri
    # on a sparse graph, so no P=6 estimator can hit small rel-err here.
    # The envelope still catches degenerate probes (the all-identical
    # hash bug gave 2,025,622 — 100x outside it).
    A = np.zeros((n, n), dtype=np.float64)  # float64 = BLAS dgemm;
    A[src, dst] = 1.0                        # exact (counts << 2^53)
    A3 = A @ A @ A
    var = 2.0 * (float((A3 ** 2).sum()) - float((np.diag(A3) ** 2).sum()))
    envelope = 5.0 * np.sqrt(var / q.HUTCH_P)
    assert abs(mean - tr3) < envelope
    # and the probes must actually differ (regression: constant probes)
    assert got.est.nunique() > 1


def test_ktruss_peel_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    edges = {(s, d) for s, d in zip(src, dst) if s < d}
    rows = []
    for r in range(1, q.TRUSS_ROUNDS + 1):
        m0 = len(edges)
        nbr = {}
        for a, b in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        edges = {(a, b) for a, b in edges
                 if len(nbr[a] & nbr[b]) >= q.TRUSS_K - 2}
        rows.append((r, m0, len(edges)))
    got = q.q_ktruss_peel(SF).to_pandas().sort_values("round")
    assert list(map(tuple, got.to_numpy())) == rows
    # peeling is monotone: survivors never exceed the round's input
    assert (got.n_survive <= got.n_edges).all()


def test_ewma_daily_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).column("ts")
    day = (np.asarray(ts).astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    lo, hi = day.min(), day.max()
    x = np.bincount(day - lo, minlength=hi - lo + 1).astype(np.int64)
    a = q.EWMA_NUM / q.EWMA_DEN
    s = np.empty(len(x))
    flag = np.zeros(len(x), dtype=bool)
    s[0] = float(x[0])
    for t in range(1, len(x)):
        flag[t] = x[t] > q.EWMA_FACTOR * s[t - 1]
        s[t] = a * x[t] + (1.0 - a) * s[t - 1]
    got = q.q_ewma_daily(SF).to_pandas().sort_values("day")
    assert np.array_equal(got.day.to_numpy(), np.arange(lo, hi + 1))
    assert np.array_equal(got.cnt.to_numpy(), x)
    assert np.array_equal(got.ewma_u.to_numpy(),
                          np.floor(s * 1e6 + 0.5).astype(np.int64))
    assert np.array_equal(got.flag.to_numpy(), flag)
