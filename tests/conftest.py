import numpy as np
import pytest

import ray

import combblas_ray  # noqa: F401  (sets the hash shuffle strategy before any dataset is created)


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    from combblas_ray.util import quiesce_data_stats
    quiesce_data_stats()  # see util.py: stats-thread post-shutdown fatal
    ray.shutdown()


@pytest.fixture(scope="session")
def ctx500(ray_session):
    """Shared n=500 corpus graph context (module-level cached)."""
    from combblas_ray.pipelines.context import get_context_for_n

    return get_context_for_n(500)


def brute_adjacency(n: int) -> dict[int, dict[int, float]]:
    """Arithmetic-space reference edges: dst -> {src: w} (dedup-summed,
    loop-free) — the ground truth the corpus generator encodes."""
    out: dict[int, dict[int, float]] = {}
    for i in range(n):
        tgts = [i % 64] + [(i * 101 + t * 4099 + 17) % n for t in range(1, i % 5 + 1)]
        for j in tgts:
            if j == i:
                continue
            out.setdefault(j, {})
            out[j][i] = out[j].get(i, 0.0) + 1.0
    return out


def brute_dense_matrix(ctx) -> np.ndarray:
    """Dense A[dst, src] in DENSE-ID space for a context."""
    n = ctx.n
    adj = brute_adjacency(n)
    dense_of_arith = np.empty(n, dtype=np.int64)
    for d, a in enumerate(ctx.arith):
        dense_of_arith[a] = d
    A = np.zeros((n, n))
    for j, srcs in adj.items():
        for i, w in srcs.items():
            A[dense_of_arith[j], dense_of_arith[i]] = w
    return A
