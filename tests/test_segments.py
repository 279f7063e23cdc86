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


def test_group_reduce_binop_tail_matches_brute():
    """band/bor/bxor/lxor vs per-group brute force (Operations.h:184-293)."""
    from combblas_ray.core.shuffle import group_reduce_per_key

    rng = np.random.RandomState(7)
    keys = rng.randint(0, 9, size=200).astype(np.int64)
    vals = rng.randint(0, 255, size=200).astype(np.float64)
    vals[rng.rand(200) < 0.2] = 0.0  # exercise lxor zeros
    for op, ufunc in [
        ("band", np.bitwise_and),
        ("bor", np.bitwise_or),
        ("bxor", np.bitwise_xor),
    ]:
        uk, red = group_reduce_per_key(vals, keys, op)
        for k, r in zip(uk, red):
            expect = ufunc.reduce(vals[keys == k].astype(np.int64))
            assert r == float(expect), (op, k)
    uk, red = group_reduce_per_key(vals, keys, "lxor")
    for k, r in zip(uk, red):
        assert r == float(np.count_nonzero(vals[keys == k]) % 2), k


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.floats(0.5, 8.0)),
        min_size=1,
        max_size=50,
    ),
    st.integers(1, 4),
)
@settings(max_examples=40, deadline=None)
def test_rand_reduce_is_member_and_partition_invariant(pairs, nsplit):
    """RandReduce analog: the pick is a member of the group, and partial
    picks per arbitrary split recombine to the same global pick
    (associativity requirement for two-level shuffle combines)."""
    from combblas_ray.core.shuffle import group_reduce_per_key

    keys = np.array([k for k, _ in pairs], dtype=np.int64)
    vals = np.array([v for _, v in pairs], dtype=np.float64)
    uk, direct = group_reduce_per_key(vals, keys, "rand")
    for k, r in zip(uk, direct):
        assert r in vals[keys == k]
    parts = np.array_split(np.arange(len(keys)), nsplit)
    pk, pv = [], []
    for p in parts:
        if len(p) == 0:
            continue
        a, b = group_reduce_per_key(vals[p], keys[p], "rand")
        pk.append(a)
        pv.append(b)
    fk, fv = group_reduce_per_key(np.concatenate(pv), np.concatenate(pk), "rand")
    assert fk.tolist() == uk.tolist()
    assert fv.tolist() == direct.tolist()


def test_bool_or_and_semiring_is_reachability():
    """bool_or_and spmv step == boolean adjacency reachability hop."""
    sr = SEMIRINGS["bool_or_and"]
    # edges (src, dst): 0->1, 1->2, 3->2 ; x = {0,3}
    src = np.array([0, 1, 3])
    dst = np.array([1, 2, 2])
    w = np.ones(3)
    x = np.array([1.0, 0.0, 0.0, 1.0])
    contrib = sr.mul(w, x[src])
    y = sr.reduce_unordered(contrib, dst, 4)
    y = np.where(np.isfinite(y), y, 0.0)
    assert y.tolist() == [0.0, 1.0, 1.0, 0.0]


def test_edge_group_apply_tasks_matches_keyed_reduce(ray_session):
    """The warm raw-task keyed apply must equal the Ray-Data hash-shuffle
    keyed_reduce on a keyed normalization (MCL's _col_normalize shape)."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.shuffle import edge_group_apply_tasks, keyed_reduce

    rng = np.random.RandomState(3)
    m = 5000
    src = rng.randint(0, 400, m).astype(np.int64)
    dst = rng.randint(0, 400, m).astype(np.int64)
    w = rng.rand(m)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst),
                  "w": pa.array(w)})
    ).repartition(8)

    def _norm(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"))
        if len(s) == 0:
            return batch
        v = np.asarray(batch.column("w")).astype(np.float64)
        uk, inv = np.unique(s, return_inverse=True)
        sums = np.bincount(inv, weights=v)[inv]
        return pa.table({"src": batch.column("src"),
                         "dst": batch.column("dst"),
                         "w": pa.array(v / sums)})

    def _collect(out_ds):
        rows = sorted(
            (r["src"], r["dst"], round(r["w"], 12))
            for r in out_ds.take_all()
        )
        return rows

    a = _collect(edge_group_apply_tasks(ds, "src", _norm))
    b = _collect(keyed_reduce(ds, ["src"], _norm))
    assert a == b
