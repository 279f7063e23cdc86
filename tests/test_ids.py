"""Distributed vertex-id assignment (`ReadGeneralizedTuples` analog,
reference ``SpParMat.cpp:3680-3984``): the raw-task sample/route/merge
dictionary + encode must agree exactly with the broadcast fast path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from combblas_ray.core.ids import (
    assign_and_encode,
    build_vertex_dict,
    distinct_labels,
    encode_edges,
    encode_edges_dict,
)


def _labeled_ds(pairs, num_blocks=4):
    import ray

    t = pa.table(
        {
            "src_label": pa.array([a for a, _ in pairs], type=pa.string()),
            "dst_label": pa.array([b for _, b in pairs], type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(num_blocks).materialize()


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_fused_dict_encode_matches_broadcast(ray_session, num_partitions):
    rng = np.random.default_rng(7)
    labels = np.array([f"v{i:04d}" for i in rng.integers(0, 300, 3000)])
    pairs = list(zip(labels[::2], labels[1::2]))
    ds = _labeled_ds(pairs)

    vdict, enc = assign_and_encode(ds, num_partitions=num_partitions)
    ref_labels = distinct_labels(ds)
    assert vdict.n == len(ref_labels)
    assert np.array_equal(vdict.materialize_labels(), ref_labels)

    got = enc.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    want = (
        encode_edges(ds, ref_labels)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_standalone_encode_against_prebuilt_dict(ray_session):
    pairs = [("b", "a"), ("c", "b"), ("a", "c"), ("d", "a"), ("a", "a")]
    ds = _labeled_ds(pairs, num_blocks=2)
    vdict = build_vertex_dict(ds, num_partitions=3)
    got = (
        encode_edges_dict(ds, vdict)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    want = (
        encode_edges(ds, distinct_labels(ds))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_dict_ranks_are_lexicographic(ray_session):
    pairs = [("zz", "aa"), ("mm", "zz"), ("aa", "mm")]
    ds = _labeled_ds(pairs, num_blocks=2)
    vdict = build_vertex_dict(ds)
    labs = vdict.materialize_labels()
    assert list(labs) == ["aa", "mm", "zz"]
    assert vdict.n == 3


def test_distributed_label_resolution(ray_session, ctx500=None):
    """Round-4 Extract-pattern surface: lookup_ids / gather_labels /
    decoder / label+arith slice refs must all agree with the
    materialized dictionary without the query path touching it."""
    import ray as _ray

    from combblas_ray.pipelines.context import get_context_for_n

    ctx = get_context_for_n(500)
    vd = ctx.vdict
    full = vd.materialize_labels()  # test oracle only
    n = vd.n

    # point lookups route to owner chunks
    for lab in ["m_0", "m_7", "m_499", "m_123"]:
        assert full[vd.lookup_id(lab)] == lab
    ids = np.array([0, 499, 17, 17, 250, 3], dtype=np.int64)
    assert list(vd.gather_labels(ids)) == list(full[ids])

    # the task-side decoder (as used inside map_batches)
    dec = vd.decoder()
    got = dec.take(ids)
    assert [g.as_py() for g in got] == list(full[ids])
    arith = dec.arith(ids)
    assert list(arith) == [int(s[2:]) for s in full[ids]]

    # per-range slices aligned with arbitrary bounds
    bounds = [(0, 123), (123, 457), (457, 500)]
    labs = _ray.get(vd.label_slice_refs(bounds))
    assert list(np.concatenate(labs)) == list(full)
    ars = _ray.get(vd.arith_slice_refs(bounds))
    assert list(np.concatenate(ars)) == [int(s[2:]) for s in full]


def test_lcg_modulus_ladder(ray_session):
    from combblas_ray.pipelines.queries import (
        LCG_P47,
        MIS_PRIO_P,
        lcg_modulus,
    )

    assert lcg_modulus(500) == MIS_PRIO_P
    assert lcg_modulus(MIS_PRIO_P - 1) == MIS_PRIO_P
    # at the old 2^31 cliff the ladder now steps up instead of raising
    assert lcg_modulus(MIS_PRIO_P) == LCG_P47
    assert lcg_modulus(2**40) == LCG_P47
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        lcg_modulus(LCG_P47)
    # exactness at the boundary: the affine map stays in int64 and is
    # injective right below each rung
    for p in (MIS_PRIO_P, LCG_P47):
        v = np.array([0, 1, p - 2, p - 1], dtype=np.int64)
        prio = (v * 48271 + 11) % p
        assert prio.dtype == np.int64 and len(np.unique(prio)) == len(v)
        assert int(v.max()) * 48271 + 11 < 2**63  # no silent wrap
