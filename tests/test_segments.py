import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from combblas_ray.core.segments import segment_reduce, segment_sum
from combblas_ray.core.semiring import SEMIRINGS


@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=40),
)
@settings(max_examples=50, deadline=None)
def test_segment_reduce_matches_brute(seg_sizes):
    rng = np.random.RandomState(0)
    total = sum(seg_sizes)
    vals = rng.rand(total) * 10
    indptr = np.concatenate(([0], np.cumsum(seg_sizes))).astype(np.int64)
    for ufunc, ident in [(np.add, 0.0), (np.minimum, np.inf), (np.maximum, -np.inf)]:
        out = segment_reduce(ufunc, vals, indptr, ident)
        for i, sz in enumerate(seg_sizes):
            seg = vals[indptr[i] : indptr[i + 1]]
            expect = ident if sz == 0 else ufunc.reduce(seg)
            assert out[i] == pytest.approx(expect)


def test_segment_sum_unordered():
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    ids = np.array([2, 0, 2, 1])
    out = segment_sum(vals, ids, 4)
    assert out.tolist() == [2.0, 4.0, 4.0, 0.0]


def test_semiring_reduce_unordered_min():
    sr = SEMIRINGS["select2nd_min"]
    out = sr.reduce_unordered(np.array([5.0, 2.0, 7.0]), np.array([1, 1, 0]), 3)
    assert out[0] == 7.0 and out[1] == 2.0 and out[2] == np.inf


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.floats(0.5, 8.0)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 5),
)
@settings(max_examples=40, deadline=None)
def test_semiring_partial_final_associativity(pairs, nsplit):
    """partial-reduce per arbitrary split + final reduce == direct reduce
    for every shipped semiring's additive monoid (SURVEY §7.4 requirement
    for correctness of the two-level shuffle combine)."""
    keys = np.array([k for k, _ in pairs], dtype=np.int64)
    vals = np.array([v for _, v in pairs], dtype=np.float64)
    for name, sr in SEMIRINGS.items():
        direct = sr.reduce_unordered(vals, keys, 10)
        # split rows arbitrarily, reduce each part, then combine parts
        parts = np.array_split(np.arange(len(keys)), nsplit)
        acc = sr.empty(10)
        for p in parts:
            if len(p) == 0:
                continue
            partial = sr.reduce_unordered(vals[p], keys[p], 10)
            acc = sr.combine(acc, partial)
        assert np.allclose(acc, direct, equal_nan=True), name
