"""General `SubsRef`/`SpAsgn` (SpParMat.cpp:2030-2264 / 2436-2482) vs a
dense numpy oracle, including permuted / repeated / rectangular index
vectors — the IndexingTest.cpp / SpAsgnTest.cpp golden-test analog."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from combblas_ray.core.indexing import spasgn, subsref


def _edges_ds(A: np.ndarray, num_blocks=3):
    import ray

    src, dst = np.nonzero(A)
    t = pa.table(
        {
            "src": pa.array(src.astype(np.int64)),
            "dst": pa.array(dst.astype(np.int64)),
            "w": pa.array(A[src, dst].astype(np.float64)),
        }
    )
    return ray.data.from_arrow(t).repartition(num_blocks)


def _to_dense(ds, nr, nc):
    out = np.zeros((nr, nc))
    for r in ds.take_all():
        out[r.get("bi", r.get("src")), r.get("bj", r.get("dst"))] += r["w"]
    return out


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_subsref_matches_dense_fancy_indexing(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 12
    A = (rng.random((n, n)) < 0.3) * rng.integers(1, 9, (n, n)).astype(float)
    ri = rng.integers(0, n, rng.integers(1, 20))  # repeats + permutation
    ci = rng.integers(0, n, rng.integers(1, 20))
    got = _to_dense(subsref(_edges_ds(A), ri, ci), len(ri), len(ci))
    want = A[np.ix_(ri, ci)]
    assert np.array_equal(got, want)


def test_subsref_permuted_rectangular(ray_session):
    n = 8
    A = np.arange(n * n, dtype=float).reshape(n, n) % 5
    A[A == 0] = 0.0
    ri = np.array([5, 2, 2, 7, 0])
    ci = np.array([3, 3, 1])
    got = _to_dense(subsref(_edges_ds(A), ri, ci), 5, 3)
    assert np.array_equal(got, A[np.ix_(ri, ci)])


def test_spasgn_matches_dense_assignment(ray_session):
    rng = np.random.default_rng(11)
    n = 10
    A = (rng.random((n, n)) < 0.4) * rng.integers(1, 9, (n, n)).astype(float)
    ri = np.array([7, 1, 4])
    ci = np.array([2, 8, 0, 5])
    B = (rng.random((3, 4)) < 0.6) * rng.integers(1, 9, (3, 4)).astype(float)
    got_ds = spasgn(_edges_ds(A), ri, ci, _edges_ds(B, num_blocks=1))
    got = _to_dense(got_ds, n, n)
    want = A.copy()
    want[np.ix_(ri, ci)] = B
    assert np.array_equal(got, want)


def test_spasgn_rejects_repeated_indices(ray_session):
    A = np.eye(4)
    with pytest.raises(ValueError):
        spasgn(_edges_ds(A), np.array([1, 1]), np.array([0, 2]),
               _edges_ds(np.eye(2), num_blocks=1))
