"""String vertex labels -> dense integer ids.

The ``ReadGeneralizedTuples`` analog (reference ``SpParMat.cpp:3889-3984``):
the reference hashes string labels to owner ranks, builds a per-rank
label->denseId permutation, then renames both edge endpoints and returns an
id->label "distmapper". Here:

1. distinct labels = ``union(src_label, dst_label)`` -> groupby-distinct
   (a hash shuffle, like the reference's label exchange);
2. deterministic id assignment = lexicographic rank (sort);
3. encoding joins: the dictionary is broadcast via ``ray.put`` once and each
   ``map_batches`` task does a vectorized ``searchsorted`` gather — the
   broadcast-hash-join path (right for dictionaries up to ~10^8 labels; past
   that, swap in a shuffle join on ``label``, same semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def distinct_labels(labeled_edges_ds) -> np.ndarray:
    """Distinct sorted labels across both endpoints (numpy unicode array).

    Batch-local unique -> hash repartition on a label hash -> partition
    unique -> driver sort (the label exchange of `ReadGeneralizedTuples`'s
    first pass, ``SpParMat.cpp:3680-3885``)."""
    import zlib

    from .shuffle import keyed_reduce

    def _partial(batch: pa.Table) -> pa.Table:
        both = np.unique(
            np.concatenate(
                [
                    np.asarray(batch.column("src_label")).astype(str),
                    np.asarray(batch.column("dst_label")).astype(str),
                ]
            )
        )
        h = np.array([zlib.crc32(s.encode()) for s in both], dtype=np.int64)
        return pa.table(
            {"h": pa.array(h), "label": pa.array(both.tolist(), type=pa.string())}
        )

    def _merge(batch: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(batch.column("label")).astype(str))
        return pa.table({"label": pa.array(u.tolist(), type=pa.string())})

    ds = keyed_reduce(
        labeled_edges_ds.map_batches(_partial, batch_format="pyarrow",
                                     zero_copy_batch=True),
        ["h"],
        _merge,
    )
    out = []
    for row in ds.take_all():
        out.append(row["label"])
    return np.sort(np.array(out, dtype=str))


def encode_edges(labeled_edges_ds, sorted_labels: np.ndarray):
    """(src_label, dst_label) -> (src, dst, w=1.0) int64 edges via broadcast dict."""
    dict_ref = ray.put(sorted_labels)

    def _encode(batch: pa.Table, *, _ref=dict_ref) -> pa.Table:
        labels = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.searchsorted(labels, np.asarray(batch.column("src_label")).astype(str))
        dst = np.searchsorted(labels, np.asarray(batch.column("dst_label")).astype(str))
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
                "w": pa.array(np.ones(len(src), dtype=np.float64)),
            }
        )

    return labeled_edges_ds.map_batches(_encode, batch_format="pyarrow")


def labels_table(sorted_labels: np.ndarray) -> pa.Table:
    """The id -> label distmapper as a table (vid, label)."""
    return pa.table(
        {
            "vid": pa.array(np.arange(len(sorted_labels), dtype=np.int64)),
            "label": pa.array(sorted_labels.tolist(), type=pa.string()),
        }
    )
