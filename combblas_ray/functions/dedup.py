"""Deduplication operators for training-data pipelines.

- ``exact_dedup``       : hash-partition on a canonical key + per-group min
                          (exact dedup; the key here is the sorted distinct
                          token set so near-identical word-soup docs group).
- ``jaccard_pairs``     : exact token-shingle Jaccard over candidate pairs
                          from an inverted shingle index (df-capped).
- ``minhash_lsh_pairs`` : MinHash signatures + banded LSH candidate
                          generation, verified with exact Jaccard.
- ``simhash``           : 64-bit SimHash over token crc32 hashes.

All shuffles use the hash-repartition + whole-partition numpy pattern.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..core.shuffle import keyed_reduce
from .text import shingle_sets, tokens_list

DF_CAP = 1000  # inverted-index document-frequency cap (both sides of oracle)


def dedup_key(batch: pa.Table) -> list[str]:
    toks = tokens_list(batch)
    return [" ".join(sorted(set(row))) for row in toks.to_pylist()]


def exact_dedup(docs_ds):
    """(doc_id, canon_id): canon = min doc_id among docs with identical
    sorted-distinct-token key. Two-stage: key hash -> partition -> group min
    -> broadcast back? No: emit (key_hash, doc_id) pairs, reduce min per
    key, then join back — here fused by carrying doc lists through the
    reduce (group sizes are tiny)."""

    def _keyed(batch: pa.Table) -> pa.Table:
        keys = dedup_key(batch)
        kh = [zlib.crc32(k.encode()) for k in keys]
        return pa.table(
            {
                "kh": pa.array(kh, type=pa.int64()),
                "key": pa.array(keys, type=pa.string()),
                "doc_id": batch.column("doc_id"),
            }
        )

    def _group(batch: pa.Table) -> pa.Table:
        import collections

        groups: dict[str, list[int]] = collections.defaultdict(list)
        for k, d in zip(
            batch.column("key").to_pylist(), batch.column("doc_id").to_pylist()
        ):
            groups[k].append(d)
        doc_ids, canon = [], []
        for ids in groups.values():
            m = min(ids)
            doc_ids.extend(ids)
            canon.extend([m] * len(ids))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "canon_id": pa.array(canon, type=pa.int64()),
            }
        )

    keyed = docs_ds.map_batches(_keyed, batch_format="pyarrow")
    return keyed_reduce(keyed, ["kh"], _group)


def _jaccard_from_candidates(shingles: dict[int, set], cands: set, tau: float):
    rows = []
    for a, b in sorted(cands):
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        if not inter:
            continue
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= tau:
            rows.append((a, b, round(jac, 6)))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], type=pa.int64()),
            "b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jac": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


def _collect_shingles(docs_ds) -> dict[int, set]:
    """Materialize per-doc shingle sets driver-side via distributed map
    (each task shingles its batch; the dict is the collected index)."""

    def _sh(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sets = shingle_sets(batch)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.array([sorted(s) for s in sets],
                                     type=pa.list_(pa.string())),
            }
        )

    out = {}
    for row in docs_ds.map_batches(_sh, batch_format="pyarrow").take_all():
        out[row["doc_id"]] = set(row["shingles"])
    return out


def jaccard_pairs(docs_ds, tau: float = 0.5):
    """Exact near-dup pairs (a < b, jaccard >= tau) among docs sharing at
    least one shingle with document frequency <= DF_CAP."""
    shingles = _collect_shingles(docs_ds)
    inv: dict[str, list[int]] = {}
    for d, ss in shingles.items():
        for s in ss:
            inv.setdefault(s, []).append(d)
    cands = set()
    for s, ids in inv.items():
        if len(ids) > DF_CAP or len(ids) < 2:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    return _jaccard_from_candidates(shingles, cands, tau)


def _minhash_params(num_perm: int = 64, seed: int = 7):
    rng = np.random.RandomState(seed)
    p = (1 << 61) - 1
    a = rng.randint(1, p, size=num_perm, dtype=np.int64)
    b = rng.randint(0, p, size=num_perm, dtype=np.int64)
    return a, b, p


def minhash_signatures(docs_ds, num_perm: int = 64):
    """(doc_id, sig list<int64>) — signature via crc32 shingle hashes and
    universal hashing; fully deterministic."""
    a, b, p = _minhash_params(num_perm)

    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = []
        for ss in shingle_sets(batch):
            if not ss:
                sigs.append([0] * num_perm)
                continue
            hv = np.array(
                [zlib.crc32(s.encode()) for s in ss], dtype=np.int64
            )
            m = ((hv[:, None] * a[None, :] + b[None, :]) % p).min(axis=0)
            sigs.append(m.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.list_(pa.int64())),
            }
        )

    return docs_ds.map_batches(_sig, batch_format="pyarrow")


def minhash_lsh_pairs(docs_ds, tau: float = 0.5, num_perm: int = 64,
                      bands: int = 16):
    """LSH candidate pairs (banded minhash buckets -> groupby) verified with
    exact Jaccard — the scalable near-dup path: shingle -> minhash -> band
    bucket shuffle -> per-bucket pairs -> exact verify."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs_ds, num_perm)

    def _buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_k, out_d = [], []
        for d, sig in zip(ids, batch.column("sig").to_pylist()):
            for bi in range(bands):
                chunk = tuple(sig[bi * rows_per_band : (bi + 1) * rows_per_band])
                h = zlib.crc32(repr((bi, chunk)).encode())
                out_k.append(h)
                out_d.append(d)
        return pa.table(
            {
                "bucket": pa.array(out_k, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
            }
        )

    def _pairs(batch: pa.Table) -> pa.Table:
        import collections

        by_bucket = collections.defaultdict(list)
        for k, d in zip(
            batch.column("bucket").to_pylist(), batch.column("doc_id").to_pylist()
        ):
            by_bucket[k].append(d)
        a_out, b_out = [], []
        for ids in by_bucket.values():
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table(
            {"a": pa.array(a_out, type=pa.int64()),
             "b": pa.array(b_out, type=pa.int64())}
        )

    bucketed = sigs.map_batches(_buckets, batch_format="pyarrow")
    cand_ds = keyed_reduce(bucketed, ["bucket"], _pairs)
    cands = {(r["a"], r["b"]) for r in cand_ds.take_all()}
    shingles = _collect_shingles(docs_ds)
    return _jaccard_from_candidates(shingles, cands, tau)


def simhash(docs_ds):
    """64-bit SimHash over token crc32 hashes -> (doc_id, simhash int64)."""

    def _sh(batch: pa.Table) -> pa.Table:
        toks = tokens_list(batch)
        out = []
        shifts = np.arange(64, dtype=np.uint64)
        for row in toks.to_pylist():
            acc = np.zeros(64, dtype=np.int64)
            for t in row:
                h = np.uint64(
                    zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
                )
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            val = 0
            for i in range(64):
                if acc[i] > 0:
                    val |= 1 << i
            # store as signed int64
            if val >= 1 << 63:
                val -= 1 << 64
            out.append(val)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(_sh, batch_format="pyarrow")
