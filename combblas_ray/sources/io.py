"""Graph I/O sources and sinks.

- ``read_matrix_market``  <- `SpParMat::ParallelReadMM`
  (``SpParMat.cpp:3993-4128``): the banner/dims are read driver-side (rank-0
  in the reference), the body is byte-range-split by ``ray.data.read_text``
  and parsed vectorized; duplicate entries merge by + downstream (the
  reference's BinOp).
- ``write_matrix_market`` <- `ParallelWriteMM` (``SpParMat.cpp:4133``) /
  `SaveGathered` — single-file gather form (debug-scale, like the
  reference's gathered writer).
- ``write_edges_parquet`` / ``read_edges_parquet`` <- `ParallelBinaryWrite`
  (``SpParMat.cpp:620``) — partitioned parquet, the production format.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.graph import Graph


def read_matrix_market(path: str, *, onebased: bool = True) -> Graph:
    import ray

    n = None
    dims_line = None
    with open(path) as f:
        for line in f:
            if line.startswith("%"):
                continue
            dims_line = line.strip()
            parts = dims_line.split()
            n = max(int(parts[0]), int(parts[1]))
            break
    if n is None:
        raise ValueError(f"no dims line in {path}")

    lines = ray.data.read_text(path)
    off = 1 if onebased else 0

    def _parse(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        keep = pc.and_(
            pc.invert(pc.starts_with(txt, "%")),
            pc.invert(pc.equal(txt, dims_line)),
        )
        txt = pc.filter(txt, keep)
        cols = pc.split_pattern(txt, " ")
        flat = np.asarray(pc.list_flatten(cols))
        widths = np.asarray(pc.list_value_length(cols))
        if len(widths) == 0:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.float64()),
                }
            )
        w3 = widths.max() >= 3
        starts = np.concatenate(([0], np.cumsum(widths)))[:-1]
        i = flat[starts].astype(np.int64) - off
        j = flat[starts + 1].astype(np.int64) - off
        v = (
            flat[starts + 2].astype(np.float64)
            if w3
            else np.ones(len(i), dtype=np.float64)
        )
        # matrix-market A(i,j) is the edge j->i in the apps' convention;
        # we store (src=j, dst=i) so SpMV propagates src->dst
        return pa.table(
            {"src": pa.array(j), "dst": pa.array(i), "w": pa.array(v)}
        )

    return Graph(n=n, edges=lines.map_batches(_parse, batch_format="pyarrow"))


def write_matrix_market(graph: Graph, path: str, *, onebased: bool = True) -> None:
    rows = graph.edges.take_all()
    off = 1 if onebased else 0
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{graph.n} {graph.n} {len(rows)}\n")
        for r in sorted(rows, key=lambda r: (r["dst"], r["src"])):
            f.write(f"{int(r['dst']) + off} {int(r['src']) + off} {r['w']:g}\n")


def write_edges_parquet(graph: Graph, path: str, *, partition_by_block: int = 0):
    """Partitioned parquet sink; with partition_by_block=g, adds the 2D
    block id as a partition column (resumable per-shard output)."""
    ds = graph.edges
    if partition_by_block:
        from ..core.partition import owner

        g = partition_by_block
        n = graph.n

        def _key(batch: pa.Table) -> pa.Table:
            br = owner(np.asarray(batch.column("dst")), n, g)
            bc = owner(np.asarray(batch.column("src")), n, g)
            return batch.append_column("bid", pa.array(br * g + bc))

        ds = ds.map_batches(_key, batch_format="pyarrow", zero_copy_batch=True)
        ds.write_parquet(path, partition_cols=["bid"])
    else:
        ds.write_parquet(path)


def read_edges_parquet(path: str, n: int) -> Graph:
    import ray

    ds = ray.data.read_parquet(path, columns=["src", "dst", "w"])
    return Graph(n=n, edges=ds)


def write_edges_jsonl(graph: Graph, path: str) -> None:
    """JSONL edge sink (`ds.write_json`): the text interchange format
    for pipelines that feed non-Arrow consumers. One file per block —
    resumable shards, same layout contract as the parquet sink."""
    graph.edges.write_json(path)


def read_edges_jsonl(path: str, n: int) -> Graph:
    """JSONL edge source (`ray.data.read_json`, byte-range splittable).
    Column types re-normalized to the engine contract (int64 ids,
    float64 w) — JSON carries no schema."""
    import ray

    ds = ray.data.read_json(path)

    def _norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch.column("src"), pa.int64()),
            "dst": pc.cast(batch.column("dst"), pa.int64()),
            "w": pc.cast(batch.column("w"), pa.float64()),
        })

    return Graph(n=n, edges=ds.map_batches(_norm, batch_format="pyarrow",
                                           zero_copy_batch=True))
