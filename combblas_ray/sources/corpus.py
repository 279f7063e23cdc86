"""Deterministic source-code corpus (repo, path, commit, lang, content).

The north-star input is a Parquet corpus of source-code repositories with
columns ``(repo, path, commit, lang, content)``; the graph is the
import-dependency graph extracted from ``content``. In this sandbox we
synthesise the corpus deterministically (seedless pure arithmetic) so that

1. the whole extraction pipeline (content -> parse imports -> string-labeled
   edges -> dense vertex ids -> edge table) runs for real on Ray Data, and
2. a DuckDB oracle can regenerate the *identical* rows/edges from the same
   integer arithmetic (``generate_series``) — giving exact end-to-end
   correctness checks including per-row ``sha256(content)`` parity
   (the input_hint invariant).

Spec (file index ``i`` in ``[0, n)``; every formula uses non-negative ints so
Python ``%`` == SQL ``%``):

- ``repo    = 'repo_' + str(i % 100)``
- ``path    = 'src/m_' + str(i) + '.py'``   (vertex label = ``m_<i>``)
- ``lang    = ['py','js','go','rs'][i % 4]``
- ``commit  = format((i*2654435761 + 40503) % 2**32, '040x')``
- import targets, in order: ``ord 0``: hub ``i % 64`` (64 hub vertices ->
  power-law-ish in-degree skew); ``ord t`` for ``t in 1..(i % 5)``:
  ``(i*101 + t*4099 + 17) % n``
- ``content = '\n'.join('import m_'+str(j) for j in targets)
             + '\n# file m_' + str(i) + ' lang=' + lang``

Edge semantics downstream (mirrors the reference ingest,
``SpParMat.cpp:3153-3270`` "keeps self-loops, sums duplicates" +
``RemoveLoops`` ``SpParMat.cpp:3270``): one (src,dst,1.0) per import
statement, duplicates summed, then self-loops dropped.

The string-label -> dense-id step is the ``ReadGeneralizedTuples`` analog
(``SpParMat.cpp:3889-3984``): distinct labels, sorted lexicographically,
ranked 0..n-1.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LANGS = ["py", "js", "go", "rs"]
NUM_HUBS = 64
NUM_REPOS = 100


def n_files_for(sf_dir: str) -> int:
    """Corpus size for a test-data scale factor dir = rows(lineitem)
    (metadata read only; the SQL oracles use count(*) of the same table)."""
    md = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    return md.num_rows


def _targets_arrays(ids: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (src_i, ord, dst_j) triples for a batch of file ids."""
    ids = ids.astype(np.int64)
    n_ext = ids % 5
    # hub edges (ord 0)
    hub_src = ids
    hub_ord = np.zeros(len(ids), dtype=np.int64)
    hub_dst = ids % NUM_HUBS
    # extras: repeat each id n_ext[i] times with ord 1..n_ext[i]
    reps = n_ext
    ext_src = np.repeat(ids, reps)
    # per-row ord sequence 1..n_ext
    csum = np.concatenate(([0], np.cumsum(reps)))[:-1]
    ext_ord = np.arange(len(ext_src), dtype=np.int64) - np.repeat(csum, reps) + 1
    ext_dst = (ext_src * 101 + ext_ord * 4099 + 17) % n
    src = np.concatenate([hub_src, ext_src])
    order = np.concatenate([hub_ord, ext_ord])
    dst = np.concatenate([hub_dst, ext_dst])
    # sort by (src, ord) so per-file target order is canonical
    perm = np.lexsort((order, src))
    return src[perm], order[perm], dst[perm]


def _hex40(v: np.ndarray) -> pa.Array:
    """Vectorized ``format(v, '040x')`` for v < 2^32: a (n, 40) uint8
    char matrix (32 zero pads + 8 hex nibbles) viewed as fixed-width
    bytes — no per-row Python."""
    v = v.astype(np.uint64)
    out = np.full((len(v), 40), ord("0"), dtype=np.uint8)
    digits = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    for k in range(8):
        out[:, 32 + k] = digits[(v >> np.uint64(4 * (7 - k))) & np.uint64(0xF)]
    return pa.array(out.reshape(-1).view("S40").astype(str))


def _istr(a: np.ndarray) -> pa.Array:
    return pc.cast(pa.array(a.astype(np.int64)), pa.string())


def corpus_batch(ids: np.ndarray, n: int, with_sha: bool = False) -> pa.Table:
    """Build corpus rows for a batch of file ids (used inside map_batches).
    Fully vectorized (Arrow string joins + a fixed-width hex matrix); the
    only per-row Python left is the optional sha256, which is inherently
    per-payload."""
    ids = np.asarray(ids, dtype=np.int64)
    repo = pc.binary_join_element_wise("repo_", _istr(ids % NUM_REPOS), "")
    path = pc.binary_join_element_wise("src/m_", _istr(ids), ".py", "")
    lang_arr = np.array(LANGS)[ids % 4]
    lang = pa.array(lang_arr, type=pa.string())
    commit = _hex40((ids.astype(np.uint64) * np.uint64(2654435761)
                     + np.uint64(40503)) % np.uint64(2**32))
    src, _ord, dst = _targets_arrays(ids, n)
    # group dst lists back per file (src is sorted, ids are sorted ranges
    # inside a batch but not necessarily contiguous -> use searchsorted)
    starts = np.searchsorted(src, ids, side="left")
    ends = np.searchsorted(src, ids, side="right")
    cnt = (ends - starts).astype(np.int64)
    # per-file line list = its imports then one comment line; map_batches
    # may COALESCE blocks in arbitrary order, so batch ids are NOT
    # globally sorted — gather each file's dst rows explicitly instead of
    # assuming they tile the arrays in ids order
    csum = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    within = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(csum, cnt)
    take_idx = np.repeat(starts, cnt) + within
    imp = pc.binary_join_element_wise("import m_", _istr(dst[take_idx]), "")
    comment = pc.binary_join_element_wise(
        "# file m_", _istr(ids), " lang=", lang, "")
    total = cnt + 1
    offs = np.cumsum(total) - total
    flat = np.empty(len(dst) + len(ids), dtype=object)
    flat[np.repeat(offs, cnt) + within] = np.asarray(imp).astype(object)
    flat[offs + cnt] = np.asarray(comment).astype(object)
    lst = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(total))), type=pa.int32()),
        pa.array(flat, type=pa.string()),
    )
    content = pc.binary_join(lst, "\n")
    if content.null_count:
        nulls = np.nonzero(np.asarray(pc.is_null(content)))[0][:5]
        raise AssertionError(
            "corpus_batch: unfilled content line slots — batch ids are "
            "expected to be sorted and unique (ray.data.range contract); "
            f"diag: nrows={len(ids)} ids[:3]={ids[:3]} ids[-3:]={ids[-3:]} "
            f"sorted={bool((np.diff(ids) > 0).all())} "
            f"len(dst)={len(dst)} cnt.sum={int(cnt.sum())} "
            f"flat_none={int(sum(x is None for x in flat))} "
            f"imp_len={len(imp)} imp_nulls={imp.null_count} "
            f"comment_nulls={comment.null_count} "
            f"null_rows={nulls.tolist()}"
        )
    cols = {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    }
    if with_sha:
        cols["sha256"] = pa.array(
            [hashlib.sha256(c.encode()).hexdigest()
             for c in content.to_pylist()],
            type=pa.string(),
        )
    return pa.table(cols)


def corpus_dataset(n: int, *, override_num_blocks: int | None = None):
    """The corpus as a streaming Ray Dataset (no full materialization)."""
    import ray

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: corpus_batch(b["id"], n),
        batch_format="numpy",
        batch_size=8192,
    )


def write_corpus_parquet(n: int, path: str, *, overwrite: bool = False) -> str:
    """Materialize the synthetic corpus as partitioned parquet — the
    north-star input shape (a Parquet corpus of source files). Returns the
    path; skips work if already present (deterministic content)."""
    import os

    done = os.path.join(path, "_DONE")
    if os.path.exists(done) and not overwrite:
        return path
    corpus_dataset(n).write_parquet(path)
    with open(done, "w") as f:
        f.write(str(n))
    return path


def corpus_from_parquet(path: str, *, columns: list[str] | None = None):
    """Read the corpus back with column pruning — an edge-extraction scan
    needs ONLY (path, content); never read the other columns off storage."""
    import ray

    return ray.data.read_parquet(path, columns=columns or ["path", "content"])


def arith_edges_dataset(
    n: int, extras_mod: int = 5, *, override_num_blocks: int | None = None
):
    """The corpus import graph emitted directly as (src, dst, w) int edges
    from the generating arithmetic — no strings. Used for large-scale
    benchmarking (same graph family, scaled density via ``extras_mod``);
    ids here are the arithmetic file ids. One weight per import statement;
    dedup/loop policy applied downstream as usual."""
    import ray

    def _edges(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        n_ext = ids % extras_mod
        hub_src, hub_dst = ids, ids % NUM_HUBS
        ext_src = np.repeat(ids, n_ext)
        csum = np.concatenate(([0], np.cumsum(n_ext)))[:-1]
        ext_ord = np.arange(len(ext_src), dtype=np.int64) - np.repeat(csum, n_ext) + 1
        ext_dst = (ext_src * 101 + ext_ord * 4099 + 17) % n
        src = np.concatenate([hub_src, ext_src])
        dst = np.concatenate([hub_dst, ext_dst])
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "w": pa.array(np.ones(len(src), dtype=np.float64)),
            }
        )

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(_edges, batch_format="numpy", batch_size=262144)


def extract_labeled_edges(corpus_ds):
    """content -> (src_label, dst_label) string edge pairs, fully vectorized.

    Arrow kernels only: split content into lines, flatten with parent ids,
    keep ``import m_*`` lines, slice off the ``import `` prefix. No per-row
    Python in this stage (the hot path of the 100 TB scan).
    """

    def _extract(batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        path = batch.column("path")
        # src label from path: 'src/<label>.py' -> <label>
        src_label = pc.struct_field(
            pc.extract_regex(path, r"src/(?P<label>m_\d+)\.py"), "label"
        )
        lines = pc.split_pattern(content, "\n")
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines)
        is_imp = pc.starts_with(flat, "import m_")
        imp = pc.filter(flat, is_imp)
        imp_parent = pc.filter(parents, is_imp)
        dst_label = pc.utf8_slice_codeunits(imp, 7)
        src_for_line = pc.take(src_label, imp_parent)
        return pa.table({"src_label": src_for_line, "dst_label": dst_label})

    return corpus_ds.map_batches(_extract, batch_format="pyarrow", zero_copy_batch=True)


def content_sha_dataset(corpus_ds):
    """(repo, path, commit, lang, sha256) — the per-row content-parity scan."""

    def _sha(batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256(c.encode()).hexdigest()
            for c in batch.column("content").to_pylist()
        ]
        return pa.table(
            {
                "repo": batch.column("repo"),
                "path": batch.column("path"),
                "commit": batch.column("commit"),
                "lang": batch.column("lang"),
                "sha256": pa.array(shas, type=pa.string()),
            }
        )

    return corpus_ds.map_batches(_sha, batch_format="pyarrow", zero_copy_batch=True)
