"""Graph I/O sources and sinks.

- ``read_matrix_market``  <- `SpParMat::ParallelReadMM`
  (``SpParMat.cpp:3993-4128``): the banner/dims are read driver-side (rank-0
  in the reference), the body is byte-range-split by ``ray.data.read_text``
  and parsed vectorized; duplicate entries merge by + downstream (the
  reference's BinOp).
- ``write_matrix_market`` <- `ParallelWriteMM` (``SpParMat.cpp:4133-4222``):
  the reference writes one file from all ranks via MPI-IO after an exscan
  of byte offsets; the Ray analog formats per-partition text SHARDS in
  parallel tasks (pandas' C csv writer over the globally sorted edge
  Dataset), then the driver streams shard bytes into the single output
  file in order — no ``take_all``, no per-row Python loop, O(1) driver
  memory. Shard files land next to the output (shared-FS contract, same
  as the block store).
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


def _mm_format_shard(tbl: pa.Table, shard_path: str, off: int) -> int:
    """Format one sorted edge partition as matrix-market body text —
    pandas' C csv writer (vectorized %g), no per-row Python. Returns
    the shard's row count."""
    import pandas as pd

    if tbl.num_rows == 0 or "dst" not in tbl.column_names:
        open(shard_path, "w").close()
        return 0
    d = np.asarray(tbl.column("dst"), dtype=np.int64) + off
    s = np.asarray(tbl.column("src"), dtype=np.int64) + off
    w = np.asarray(tbl.column("w"), dtype=np.float64)
    pd.DataFrame({"d": d, "s": s, "w": w}).to_csv(
        shard_path, sep=" ", header=False, index=False, float_format="%g"
    )
    return len(d)


def write_matrix_market(graph: Graph, path: str, *, onebased: bool = True) -> None:
    """Distributed single-file matrix-market writer (`ParallelWriteMM`,
    ``SpParMat.cpp:4133-4222``): distributed sort by (dst, src), one
    formatting task per sorted partition writing a text shard, then a
    driver-side ordered byte concat under the banner — the driver never
    holds rows."""
    import os
    import shutil
    import tempfile

    import ray

    from ..core.shuffle import _rt0

    off = 1 if onebased else 0
    refs = graph.edges.sort(["dst", "src"]).to_arrow_refs()
    tmpdir = tempfile.mkdtemp(prefix=".mm_shards_",
                              dir=os.path.dirname(os.path.abspath(path)))
    try:
        shard_paths = [os.path.join(tmpdir, f"shard_{i:06d}.txt")
                       for i in range(len(refs))]
        counts = ray.get([
            _rt0(_mm_format_shard).remote(r, p, off)
            for r, p in zip(refs, shard_paths)
        ])
        with open(path, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real general\n")
            f.write(f"{graph.n} {graph.n} {sum(counts)}\n")
            for p, c in zip(shard_paths, counts):
                if c:
                    with open(p) as sf:
                        shutil.copyfileobj(sf, f, 1 << 20)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


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


def write_edges_ipc(graph: Graph, path: str) -> None:
    """Arrow IPC stream edge sink: one ``part-NNNNN.arrows`` shard per
    block, written by warm num_cpus=0 tasks straight from the Dataset's
    Arrow refs — the zero-copy binary interchange for Arrow-native
    consumers (Flight/mmap readers). Same resumable one-file-per-block
    layout contract as the parquet and JSONL sinks."""
    import os

    import ray

    @ray.remote(num_cpus=0)
    def _shard(tbl: pa.Table, p: str) -> int:
        tmp = p + ".tmp"
        with pa.OSFile(tmp, "wb") as f, pa.ipc.new_stream(f, tbl.schema) as w:
            w.write_table(tbl)
        os.replace(tmp, p)  # atomic publish: readers never see partials
        return tbl.num_rows

    refs = graph.edges.to_arrow_refs()
    ray.get([
        _shard.remote(r, os.path.join(path, f"part-{i:05d}.arrows"))
        for i, r in enumerate(refs)
    ])


def read_edges_ipc(path: str, n: int) -> Graph:
    """Arrow IPC stream edge source: shard files load in parallel tasks
    and become the Dataset's blocks zero-copy (`from_arrow_refs`); the
    schema rides in-band, so no re-normalization is needed."""
    import glob
    import os

    import ray

    @ray.remote(num_cpus=0)
    def _load(p: str) -> pa.Table:
        with pa.OSFile(p, "rb") as f:
            return pa.ipc.open_stream(f).read_all()

    files = sorted(glob.glob(os.path.join(path, "part-*.arrows")))
    return Graph(
        n=n, edges=ray.data.from_arrow_refs([_load.remote(p) for p in files])
    )
