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
