"""Deduplication operators for training-data pipelines.

- ``exact_dedup``       : hash-partition on a canonical key + per-group min
                          (exact dedup; the key here is the sorted distinct
                          token set so near-identical word-soup docs group).
- ``jaccard_pairs``     : exact token-shingle Jaccard, COUNT-based: the
                          df-capped posting shuffle emits doc pairs with
                          multiplicity (+ riding doc sizes); one (a,b)
                          shuffle turns multiplicity into the exact
                          intersection — no shingle strings ship per pair.
                          Falls back to the string-verify join path only
                          when some shingle exceeds DF_CAP.
- ``minhash_lsh_pairs`` : MinHash signatures (distinct-shingle crc32 +
                          segment reduceat) + banded LSH candidates,
                          verified with exact Jaccard via distributed
                          joins against the shingle table.
- ``simhash``           : 64-bit SimHash over token crc32 hashes
                          (vectorized: one ±1 bit matrix per batch).

Everything stays a Ray Dataset end-to-end — no driver-side dict or
``take_all`` anywhere, so the memory high-water mark per task is one
partition, not the corpus. All shuffles use the hash-repartition +
whole-partition numpy pattern.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.shuffle import group_apply_tasks, hash_join_tasks
from .text import tokens_list

DF_CAP = 1000  # inverted-index document-frequency cap (both sides of oracle)


def dedup_key(batch: pa.Table) -> pa.Array:
    """Canonical key per doc: sorted distinct tokens space-joined —
    vectorized (flat tokens -> lexsort distinct per doc -> rebuilt list
    array -> one Arrow binary_join), no Python per row."""
    toks = tokens_list(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    nrows = batch.num_rows
    if len(flat) == 0:
        return pa.array([""] * nrows, type=pa.string())
    order = np.lexsort((flat, par))
    f, p = flat[order], par[order]
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]) | (f[1:] != f[:-1])
    f, p = f[keep], p[keep]
    counts = np.bincount(p, minlength=nrows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    lst = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(f.tolist(), type=pa.string())
    )
    return pc.binary_join(lst, " ")


def exact_dedup(docs_ds, digest: bool = False):
    """(doc_id, canon_id): canon = min doc_id among docs with identical
    sorted-distinct-token key. Emit (key_hash, key, doc_id) rows, route by
    hash, vectorized group-min per partition.

    ``digest=True`` is the scale path: ships a 128-bit blake2b digest of
    the key (two int64 columns) instead of the full key string through
    the shuffle — ~100x fewer bytes for word-soup docs; results are
    identical to the exact-string path unless two distinct keys collide
    in 128 bits (~2^-64 per pair, negligible at any corpus size)."""

    def _keyed(batch: pa.Table) -> pa.Table:
        keys = dedup_key(batch)
        ks = np.asarray(keys).astype(str)
        uniq, inv = np.unique(ks, return_inverse=True)  # dups hash once
        if digest:
            import hashlib

            if len(uniq):
                dgs = np.frombuffer(
                    b"".join(
                        hashlib.blake2b(k.encode(), digest_size=16).digest()
                        for k in uniq
                    ),
                    dtype=np.int64,
                ).reshape(-1, 2)
            else:
                dgs = np.zeros((0, 2), dtype=np.int64)
            return pa.table(
                {
                    "kh": pa.array(dgs[inv, 0]),
                    "kh2": pa.array(dgs[inv, 1]),
                    "doc_id": batch.column("doc_id"),
                }
            )
        hu = np.fromiter(
            (zlib.crc32(k.encode()) for k in uniq),
            dtype=np.int64, count=len(uniq),
        )
        return pa.table(
            {
                "kh": pa.array(hu[inv]),
                "key": keys,
                "doc_id": batch.column("doc_id"),
            }
        )

    def _group(batch: pa.Table) -> pa.Table:
        """Vectorized group-min: sort by (key, id) — the first row of each
        key run is its min doc_id; broadcast it down the run. Key = the
        full string (exact path) or the (kh, kh2) digest pair."""
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        if digest:
            k1 = np.asarray(batch.column("kh"), dtype=np.int64)
            k2 = np.asarray(batch.column("kh2"), dtype=np.int64)
            order = np.lexsort((ids, k2, k1))
            d = ids[order]
            new = np.ones(len(d), dtype=bool)
            if len(d):
                new[1:] = (k1[order][1:] != k1[order][:-1]) | (
                    k2[order][1:] != k2[order][:-1])
        else:
            keys = np.asarray(batch.column("key")).astype(object)
            order = np.lexsort((ids, keys))
            k, d = keys[order], ids[order]
            new = np.ones(len(k), dtype=bool)
            if len(k):
                new[1:] = k[1:] != k[:-1]
        grp = np.cumsum(new) - 1
        canon = d[new][grp] if len(d) else d
        return pa.table(
            {
                "doc_id": pa.array(d),
                "canon_id": pa.array(canon),
            }
        )

    keyed = docs_ds.map_batches(_keyed, batch_format="pyarrow")
    return group_apply_tasks(keyed, ["kh"], _group)


# ---------------------------------------------------------------------------
# distributed shingle table + inverted index + exact-Jaccard verify
# ---------------------------------------------------------------------------


_SEP = "\x1f"  # shingles can't contain it (tokens are space-joined words)


def _flat_distinct_shingles(batch: pa.Table, k: int = 3):
    """Vectorized per-batch shingle construction shared by the inverted
    index, the shingle table and minhash: 3-gram shingles from ONE Arrow
    binary_join_element_wise over shifted flat-token slices (windows
    crossing doc boundaries masked by parent index), distinct per doc
    via lexsort. Returns (shingles sorted by (doc, shingle), doc row
    positions) as numpy arrays — both empty when no doc has k tokens."""
    toks = tokens_list(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    m = len(flat)
    none = (np.empty(0, dtype=str), np.empty(0, dtype=np.int64))
    if m < k:
        return none
    par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    sh = pc.binary_join_element_wise(
        *[flat.slice(j, m - k + 1) for j in range(k)], " "
    )
    within = par[: m - k + 1] == par[k - 1:]
    if not within.any():
        return none
    s_arr = np.asarray(sh).astype(str)[within]
    d_arr = par[: m - k + 1][within]
    order = np.lexsort((s_arr, d_arr))
    s_arr, d_arr = s_arr[order], d_arr[order]
    keep = np.ones(len(d_arr), dtype=bool)
    keep[1:] = (d_arr[1:] != d_arr[:-1]) | (s_arr[1:] != s_arr[:-1])
    return s_arr[keep], d_arr[keep]


def _rebuild_list(s_arr, d_arr, nrows: int) -> pa.ListArray:
    """(values sorted by doc, doc positions) -> per-doc list array."""
    counts = np.bincount(d_arr, minlength=nrows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(s_arr.tolist(), type=pa.string())
    )


def shingle_table(docs_ds):
    """(doc_id, shingles) as a distributed Dataset — the per-doc shingle
    set packed into ONE delimiter-joined string so it can ride through
    Arrow hash joins (list<string> is unsupported as a join payload)."""

    def _sh(batch: pa.Table) -> pa.Table:
        s_arr, d_arr = _flat_distinct_shingles(batch)
        lst = _rebuild_list(s_arr, d_arr, batch.num_rows)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pc.binary_join(lst, _SEP),
            }
        )

    return docs_ds.map_batches(_sh, batch_format="pyarrow")


def _exploded_shingles(docs_ds, with_size: bool = False):
    """One (shingle, doc_id) row per distinct shingle per doc;
    ``with_size`` adds the doc's shingle-set size to every row so the
    count-based verify needs no size join."""

    def _ex(batch: pa.Table) -> pa.Table:
        """Fully vectorized via `_flat_distinct_shingles` — no Python
        per row."""
        s_arr, d_arr = _flat_distinct_shingles(batch)
        if len(s_arr) == 0:
            cols = {
                "shingle": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
            }
            if with_size:
                cols["size"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        cols = {
            "shingle": pa.array(s_arr.tolist(), type=pa.string()),
            "doc_id": pa.array(doc_ids[d_arr]),
        }
        if with_size:
            sizes = np.bincount(d_arr, minlength=batch.num_rows)
            cols["size"] = pa.array(sizes[d_arr])
        return pa.table(cols)

    return docs_ds.map_batches(_ex, batch_format="pyarrow")


def _dedup_pairs(pairs_ds):
    """Distinct (a, b) via hash shuffle on both keys + per-partition
    lexsort/unique."""

    def _uniq(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a):
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return group_apply_tasks(pairs_ds, ["a", "b"], _uniq)


def _join_partitions() -> int:
    """Join fan-out sized to the cluster: each aggregator reserves
    0.125 CPU, and a verify pipeline runs two chained joins — cap the
    total reservation so small clusters don't starve the map tasks."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(16, cpus // 2))


_METRIC_COL = {"jaccard": "jac", "containment": "cont"}


def _verify_pairs(cand_ds, sh_tbl, tau: float,
                  num_partitions: int | None = None,
                  metric: str = "jaccard"):
    """Exact-Jaccard (or containment) verify as two distributed hash
    joins (warm-task co-partitioned Arrow joins — no per-use operator
    spawn): candidates x shingles(a), then x shingles(b) with the
    per-partition set intersection fused into the second join task.
    Output (a, b, <metric> round 6) for value >= tau (unordered)."""
    np_ = num_partitions or _join_partitions()
    col = _METRIC_COL[metric]
    sh_m = sh_tbl.materialize()
    sa = sh_m.rename_columns({"doc_id": "a", "shingles": "sh_a"})
    sb = sh_m.rename_columns({"doc_id": "b", "shingles": "sh_b"})

    def _jac(batch: pa.Table) -> pa.Table:
        """Vectorized per-pair set intersection: dictionary-encode every
        shingle token once per batch, key tokens as pair*K + code, and
        count per-pair duplicates across the two sides with bincount —
        no Python loop over pairs."""
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                col: pa.array([], type=pa.float64()),
            }
        )
        npairs = batch.num_rows
        if npairs == 0:
            return empty
        sh_a = pc.split_pattern(batch.column("sh_a"), _SEP).combine_chunks()
        sh_b = pc.split_pattern(batch.column("sh_b"), _SEP).combine_chunks()
        flat_a = pc.list_flatten(sh_a)
        flat_b = pc.list_flatten(sh_b)
        comb = pa.concat_arrays([flat_a, flat_b])
        enc = comb.dictionary_encode()
        K = np.int64(len(enc.dictionary))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # "" packs an empty shingle set -> split yields one "" token
        nonempty = np.asarray(pc.not_equal(comb, "")) if len(comb) else (
            np.zeros(0, dtype=bool))
        pia = pc.list_parent_indices(sh_a).to_numpy().astype(np.int64)
        pib = pc.list_parent_indices(sh_b).to_numpy().astype(np.int64)
        na = len(flat_a)
        keys_a = np.unique(
            (pia * K + codes[:na])[nonempty[:na]])  # dedupe within doc
        keys_b = np.unique((pib * K + codes[na:])[nonempty[na:]])
        len_a = np.bincount(keys_a // K, minlength=npairs)
        len_b = np.bincount(keys_b // K, minlength=npairs)
        keys = np.sort(np.concatenate([keys_a, keys_b]))
        dup = keys[:-1][keys[1:] == keys[:-1]] if len(keys) else keys
        inter = np.bincount(dup // K, minlength=npairs)
        if metric == "jaccard":
            denom = len_a + len_b - inter
        else:
            denom = np.minimum(len_a, len_b)
        val = inter / np.maximum(denom, 1)
        keep = (inter > 0) & (val >= tau)  # threshold BEFORE rounding
        val = np.round(val, 6)
        if not keep.any():
            return empty
        return pa.table(
            {
                "a": pc.filter(batch.column("a"), pa.array(keep)),
                "b": pc.filter(batch.column("b"), pa.array(keep)),
                col: pa.array(val[keep], type=pa.float64()),
            }
        )

    j = hash_join_tasks(cand_ds, sa, on="a", num_partitions=np_)
    return hash_join_tasks(j, sb, on="b", num_partitions=np_, post=_jac)


def _run_pairs(starts: np.ndarray, sizes: np.ndarray, *cols: np.ndarray):
    """All within-run (i < j) pairs over run-structured arrays, batched by
    DISTINCT run size: runs of equal size m stack into an (R, m) matrix
    and emit their triangular pairs in one fancy-index op — Python loops
    over the few distinct sizes, never over runs or rows. Returns, per
    input column, (left_values, right_values) concatenated across runs."""
    outs = [[] for _ in range(2 * len(cols))]
    for m in np.unique(sizes):
        if m < 2:
            continue
        s_m = starts[sizes == m]
        idx = s_m[:, None] + np.arange(m)
        ii, jj = np.triu_indices(int(m), k=1)
        for c, col in enumerate(cols):
            mat = col[idx]
            outs[2 * c].append(mat[:, ii].ravel())
            outs[2 * c + 1].append(mat[:, jj].ravel())
    if not outs[0]:
        return tuple(np.empty(0, dtype=np.int64) for _ in range(2 * len(cols)))
    return tuple(np.concatenate(o) for o in outs)


def _postings_pairs_counted(batch: pa.Table,
                            df_cap: int = DF_CAP) -> pa.Table:
    """Whole-partition reduce over a hash-partitioned posting list: for
    each shingle with 2 <= df <= df_cap emit (a, b, size_a, size_b) doc
    pairs (a < b) WITH multiplicity — the per-(a,b) copy count IS the
    shingle-intersection size. One sentinel row (a=-1, b=count) records
    shingles over the cap (forces the string-verify fallback).
    (shingle, doc) rows are distinct by construction (`_exploded_shingles`
    emits per-doc distinct shingles), so runs sorted by (shingle, doc)
    pair directly via `_run_pairs` — no per-run Python."""
    sh = np.asarray(batch.column("shingle")).astype(object)
    ds = np.asarray(batch.column("doc_id"), dtype=np.int64)
    sz = np.asarray(batch.column("size"), dtype=np.int64)
    order = np.lexsort((ds, sh))
    sh, ds, sz = sh[order], ds[order], sz[order]
    new = np.ones(len(sh), dtype=bool)
    if len(sh):
        new[1:] = sh[1:] != sh[:-1]
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.append(starts, len(sh)))
    capped = int((sizes > df_cap).sum())
    ok = sizes <= df_cap
    a, b, sa, sb = ([], [], [], [])
    if ok.any():
        # (doc_left, doc_right, size_left, size_right)
        av, bv, sav, sbv = _run_pairs(starts[ok], sizes[ok], ds, sz)
        a, b, sa, sb = [av], [bv], [sav], [sbv]
    if capped:
        a.append(np.array([-1], dtype=np.int64))
        b.append(np.array([capped], dtype=np.int64))
        sa.append(np.zeros(1, dtype=np.int64))
        sb.append(np.zeros(1, dtype=np.int64))
    if not a:
        return pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64()),
                         "sa": pa.array([], type=pa.int64()),
                         "sb": pa.array([], type=pa.int64())})
    return pa.table({"a": pa.array(np.concatenate(a)),
                     "b": pa.array(np.concatenate(b)),
                     "sa": pa.array(np.concatenate(sa)),
                     "sb": pa.array(np.concatenate(sb))})


def _split_cap_sentinel(tbl: pa.Table):
    """(real pair rows, capped-shingle count) from a counted-postings
    partition (sentinel rows have a < 0)."""
    if tbl.num_rows == 0 or "a" not in tbl.column_names:
        return tbl, 0
    a = np.asarray(tbl.column("a"), dtype=np.int64)
    neg = a < 0
    if not neg.any():
        return tbl, 0
    b = np.asarray(tbl.column("b"), dtype=np.int64)
    return tbl.filter(pa.array(~neg)), int(b[neg].sum())


def _pair_jac_reduce(tau: float, metric: str = "jaccard"):
    """Per (a,b)-partition: multiplicity = |intersection|, sizes ride the
    rows -> exact Jaccard (or containment = inter/min size) with zero
    string movement."""
    col = _METRIC_COL[metric]

    def _f(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          col: pa.array([], type=pa.float64())})
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return empty
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        sa = np.asarray(batch.column("sa"), dtype=np.int64)
        sb = np.asarray(batch.column("sb"), dtype=np.int64)
        order = np.lexsort((b, a))
        a, b, sa, sb = a[order], b[order], sa[order], sb[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(new)[0]
        co = np.diff(np.append(starts, len(a)))
        a0, b0, sa0, sb0 = a[starts], b[starts], sa[starts], sb[starts]
        if metric == "jaccard":
            val = co / (sa0 + sb0 - co)
        else:
            val = co / np.minimum(sa0, sb0)
        keep = val >= tau  # threshold BEFORE rounding (oracle parity)
        if not keep.any():
            return empty
        return pa.table({"a": pa.array(a0[keep]), "b": pa.array(b0[keep]),
                         col: pa.array(np.round(val[keep], 6))})

    return _f


def _sim_pairs(docs_ds, tau: float, metric: str):
    """Shared exact similarity-pair plan (jaccard / containment): see
    `jaccard_pairs` for the count-based design."""
    import ray

    from ..core.shuffle import _rt0

    docs = docs_ds.materialize()
    posted = group_apply_tasks(
        _exploded_shingles(docs, with_size=True), ["shingle"],
        _postings_pairs_counted,
    )
    # one warm task wave splits off the per-partition cap sentinels
    # (cheaper than a filter+sum operator execution per call)
    halves = [
        _rt0(_split_cap_sentinel).options(num_returns=2).remote(b)
        for b in posted.to_arrow_refs()
    ]
    pairs = ray.data.from_arrow_refs([h[0] for h in halves])
    capped = sum(ray.get([h[1] for h in halves]))
    if capped:
        cands = _dedup_pairs(pairs.select_columns(["a", "b"]))
        return _verify_pairs(cands, shingle_table(docs), tau,
                             metric=metric)
    return group_apply_tasks(pairs, ["a", "b"],
                             _pair_jac_reduce(tau, metric=metric))


def jaccard_pairs(docs_ds, tau: float = 0.5):
    """Exact near-dup pairs (a < b, jaccard >= tau) among docs sharing at
    least one shingle with document frequency <= DF_CAP. Fully
    distributed, count-based: posting-list shuffle emits pairs with
    multiplicity + doc sizes, ONE (a,b) shuffle turns multiplicity into
    the exact intersection — no shingle strings ever ship per pair.
    If any shingle exceeds DF_CAP (its shared shingles are dropped from
    the pair stream, so counts would undercount), falls back to the
    exact string-verify join path. Returns a Dataset (a, b, jac)."""
    return _sim_pairs(docs_ds, tau, "jaccard")


def _dup_und(batch: pa.Table) -> pa.Table:
    a = np.asarray(batch.column("a"), dtype=np.int64)
    b = np.asarray(batch.column("b"), dtype=np.int64)
    return pa.table({"u": pa.array(np.concatenate([a, b])),
                     "v": pa.array(np.concatenate([b, a]))})


def _dup_init(batch: pa.Table) -> pa.Table:
    v = np.unique(np.asarray(batch.column("u"), dtype=np.int64))
    return pa.table({"v": pa.array(v), "lbl": pa.array(v)})


def _dup_min(t: pa.Table) -> pa.Table:
    v = np.asarray(t.column("v"), dtype=np.int64)
    lbl = np.asarray(t.column("lbl"), dtype=np.int64)
    uv, inv = np.unique(v, return_inverse=True)
    out = np.full(len(uv), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(out, inv, lbl)
    return pa.table({"v": pa.array(uv), "lbl": pa.array(out)})


def _dup_msg(t: pa.Table) -> pa.Table:
    return pa.table({"v": t.column("v"), "lbl": t.column("lbl")})


def dup_clusters(docs_ds, tau: float = 0.5, rounds: int = 6):
    """Near-duplicate cluster labels: connected components of the exact
    Jaccard pair graph by ``rounds`` synchronous min-label rounds — the
    canonical-document assignment step of a dedup pipeline (cluster id =
    the smallest doc_id reachable within ``rounds`` hops; with enough
    rounds, the true component minimum, i.e. the kept canonical doc).
    Fully distributed: the (tiny) pair graph stays a Dataset; each round
    is one co-partitioned hash join (neighbor label messages) + one
    keyed min reduce on warm tasks. Docs in no pair are omitted.
    Returns a Dataset (doc_id, cluster)."""
    pairs = jaccard_pairs(docs_ds, tau)
    und = pairs.map_batches(_dup_und, batch_format="pyarrow").materialize()
    lab = group_apply_tasks(
        und.map_batches(_dup_init, batch_format="pyarrow"), ["v"], _dup_min
    )
    for _ in range(rounds):
        msgs = hash_join_tasks(und, lab, on="u", right_on="v",
                               post=_dup_msg)
        lab = group_apply_tasks(msgs.union(lab), ["v"], _dup_min)

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("v"), "cluster": t.column("lbl")})

    return lab.map_batches(_rename, batch_format="pyarrow")


def containment_pairs(docs_ds, tau: float = 0.8):
    """Exact CONTAINMENT near-dup pairs: |A∩B| / min(|A|, |B|) >= tau
    (a < b) over distinct 3-gram shingle sets — the quote/subset
    detector (a short doc embedded in a long one scores ~1.0 where
    Jaccard stays low). Same fully-distributed count-based plan as
    `jaccard_pairs`; returns a Dataset (a, b, cont)."""
    return _sim_pairs(docs_ds, tau, "containment")


def _minhash_params(num_perm: int = 64, seed: int = 7):
    """Universal-hash family h(x) = (a*x + b) mod p over 32-bit inputs,
    p = 2^61 - 1. a, b are 32-bit so a*x + b < 2^64 — computed exactly
    in uint64, no silent wraparound (the earlier int64 (hv*a+b) %% p
    overflowed and broke the collision-probability guarantee)."""
    rng = np.random.RandomState(seed)
    p = np.uint64((1 << 61) - 1)
    a = rng.randint(1, 1 << 32, size=num_perm).astype(np.uint64)
    b = rng.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
    return a, b, p


def minhash_signatures(docs_ds, num_perm: int = 64):
    """(doc_id, sig list<int64>) — signature via md5-low-64 shingle
    hashes folded to 32 bits (= DuckDB ``md5_number_lower(s) %% 2^32``,
    so the SQL oracle reproduces signatures bit-exactly) and universal
    hashing; fully deterministic."""
    from .text import md5_lower64

    a, b, p = _minhash_params(num_perm)

    def _sig(batch: pa.Table) -> pa.Table:
        """Batch-vectorized: hash each DISTINCT shingle once (shingles
        repeat heavily across docs), permute the unique hashes in one
        (U, num_perm) matrix op, per-doc min via segment reduceat —
        bit-identical to the per-doc loop it replaces."""
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        s_arr, d_arr = _flat_distinct_shingles(batch)
        lens = np.bincount(d_arr, minlength=batch.num_rows)
        sigs = np.zeros((len(ids), num_perm), dtype=np.uint64)
        if len(s_arr):
            uniq, inv = np.unique(s_arr, return_inverse=True)
            hu = np.fromiter(
                (md5_lower64(t) for t in uniq),
                dtype=np.uint64, count=len(uniq),
            ) % np.uint64(1 << 32)
            Hu = (hu[:, None] * a[None, :] + b[None, :]) % p
            Hi = Hu[inv]  # instance rows, already in doc order
            offsets = np.concatenate(([0], np.cumsum(lens)))
            nz = lens > 0
            # empty docs collapse to zero-length offsets, so consecutive
            # nonzero starts bound exactly one doc's rows each
            starts = offsets[:-1][nz]
            sigs[nz] = np.minimum.reduceat(Hi, starts, axis=0)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs.astype(np.int64).tolist(),
                                type=pa.list_(pa.int64())),
            }
        )

    return docs_ds.map_batches(_sig, batch_format="pyarrow")


# Per-bucket pair-expansion cap (the LSH twin of DF_CAP): a degenerate
# bucket (boilerplate / license files at corpus scale) would otherwise
# emit C(B, 2) pairs in one task. Over-cap runs fall back to an
# anchor-star expansion: every member pairs with the LSH_CAP_ANCHORS
# smallest doc_ids of the bucket — O(B * anchors) emission that keeps
# every member connected to the bucket's canonical docs (dup-cluster
# connectivity preserved; pairs remain exact-Jaccard verified), while
# the full quadratic pair set of a near-identical pile is redundant for
# dedup anyway. Gate-scale buckets never reach the cap, so oracle
# parity is untouched.
LSH_BUCKET_CAP = 512
LSH_CAP_ANCHORS = 8


def minhash_lsh_pairs(docs_ds, tau: float = 0.5, num_perm: int = 64,
                      bands: int = 16, bucket_cap: int = LSH_BUCKET_CAP,
                      cap_anchors: int = LSH_CAP_ANCHORS):
    """LSH candidate pairs (banded minhash buckets -> bucket shuffle ->
    per-bucket pairs -> pair-dedup shuffle) verified with exact Jaccard
    via distributed joins — the scalable near-dup path. Buckets larger
    than ``bucket_cap`` switch from triangular to anchor-star expansion
    (see `LSH_BUCKET_CAP`). Returns a Dataset (a, b, jac)."""
    from .text import _FP_MASK, _fp_mulmod

    rows_per_band = num_perm // bands
    docs = docs_ds.materialize()  # scanned twice (signatures + verify)
    sigs = minhash_signatures(docs, num_perm)

    def _buckets(batch: pa.Table) -> pa.Table:
        """Vectorized banded bucketing: the (n, num_perm) signature matrix
        folds each band's rows_per_band lanes with a Horner chain
        h = (h*1000003 + sig) mod 2^61 seeded with band+1 — one
        (n, bands) matrix op, no per-row Python, and bit-reproducible in
        SQL (HUGEINT list_reduce, `sqlgen.minhash_pairs`). Sig values are
        < 2^61 - 1, so the fold is exact in uint64; every candidate is
        exact-Jaccard verified downstream."""
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        nrows = batch.num_rows
        sig = batch.column("sig")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        if nrows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        # use the first bands*rows_per_band lanes (bands need not divide
        # num_perm — parity with the pre-vectorized slicing loop)
        S = np.asarray(pc.list_flatten(sig), dtype=np.int64).reshape(
            nrows, num_perm)[:, : bands * rows_per_band].reshape(
            nrows, bands, rows_per_band).view(np.uint64)
        h = np.broadcast_to(
            np.arange(1, bands + 1, dtype=np.uint64)[None, :], (nrows, bands)
        ).copy()
        for j in range(rows_per_band):
            h = (_fp_mulmod(h) + S[:, :, j]) & _FP_MASK
        bucket = h.astype(np.int64)  # < 2^61, nonnegative
        return pa.table(
            {
                "bucket": pa.array(bucket.reshape(-1)),
                "doc_id": pa.array(np.repeat(ids, bands)),
            }
        )

    def _pairs(batch: pa.Table) -> pa.Table:
        """Whole-partition pair emission: lexsort (bucket, doc), distinct,
        bucket-run triangular pairs via `_run_pairs` (Python loops over
        distinct run sizes only, never rows). Runs over ``bucket_cap``
        use the anchor-star fallback — no quadratic blow-up from one
        degenerate bucket."""
        bk = np.asarray(batch.column("bucket"), dtype=np.int64)
        ds = np.asarray(batch.column("doc_id"), dtype=np.int64)
        order = np.lexsort((ds, bk))
        bk, ds = bk[order], ds[order]
        keep = np.ones(len(bk), dtype=bool)
        if len(bk):
            keep[1:] = (bk[1:] != bk[:-1]) | (ds[1:] != ds[:-1])
        bk, ds = bk[keep], ds[keep]
        new = np.ones(len(bk), dtype=bool)
        if len(bk):
            new[1:] = bk[1:] != bk[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, len(bk)))
        ok = sizes <= bucket_cap
        a, b = _run_pairs(starts[ok], sizes[ok], ds)
        out_a, out_b = [a], [b]
        for s0, m in zip(starts[~ok], sizes[~ok]):
            # anchor-star: members sorted ascending within the run, so
            # the first `cap_anchors` are the smallest ids; pairs
            # (anchor, member) keep a < b by construction
            mem = ds[s0:s0 + m]
            na = min(cap_anchors, m - 1)
            anc = mem[:na]
            ii, jj = np.nonzero(anc[:, None] < mem[None, :])
            out_a.append(anc[ii])
            out_b.append(mem[jj])
        return pa.table({"a": pa.array(np.concatenate(out_a)),
                         "b": pa.array(np.concatenate(out_b))})

    bucketed = sigs.map_batches(_buckets, batch_format="pyarrow")
    cands = _dedup_pairs(group_apply_tasks(bucketed, ["bucket"], _pairs))
    return _verify_pairs(cands, shingle_table(docs), tau)


def simhash(docs_ds):
    """64-bit SimHash over md5-low-64 token hashes -> (doc_id, simhash
    int64). The hash basis is DuckDB's ``md5_number_lower``
    (`text.md5_lower64`), so the SQL oracle reproduces it bit-exactly.

    Vectorized: hash each DISTINCT token in the batch once (the only
    Python loop), expand via np.unique's inverse, build the full
    (n_token_occurrences, 64) ±1 bit matrix and scatter-add it into
    per-doc accumulators with one np.add.at."""
    from .text import md5_lower64

    def _sh(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokens_list(batch)
        flat = np.asarray(pc.list_flatten(toks)).astype(object)
        par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        nrows = batch.num_rows
        shifts = np.arange(64, dtype=np.uint64)
        acc = np.zeros((nrows, 64), dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat.astype(str), return_inverse=True)
            hu = np.empty(len(uniq), dtype=np.uint64)
            for i, t in enumerate(uniq):
                hu[i] = md5_lower64(t)
            h = hu[inv]  # per-occurrence hash
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            np.add.at(acc, par, bits * 2 - 1)
        pos = (acc > 0).astype(np.uint64)
        vals = (pos << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        out = vals.view(np.int64)  # store as signed int64
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out),
            }
        )

    return docs_ds.map_batches(_sh, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _bench_shingles(mod: int):
    def _b(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        keep = doc % mod == 0
        if not keep.any():
            return pa.table({"s": pa.array([], type=pa.string())})
        s_arr, d_arr = _flat_distinct_shingles(
            batch.filter(pa.array(keep))
        )
        return pa.table({
            "s": pa.array(np.unique(s_arr).tolist(), type=pa.string())
        })
    return _b


def _contam_probe(bench_ref, mod: int):
    import ray

    def _p(batch: pa.Table) -> pa.Table:
        bench = (bench_ref if isinstance(bench_ref, np.ndarray)
                 else ray.get(bench_ref))
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        s_arr, d_arr = _flat_distinct_shingles(batch)
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_contam": pa.array([], type=pa.int64()),
        })
        if not len(s_arr) or not len(bench):
            return empty
        pos = np.searchsorted(bench, s_arr)
        pos = np.minimum(pos, len(bench) - 1)
        hit = (bench[pos] == s_arr) & (doc[d_arr] % mod != 0)
        if not hit.any():
            return empty
        uv, cnt = np.unique(d_arr[hit], return_counts=True)
        return pa.table({
            "doc_id": pa.array(doc[uv], type=pa.int64()),
            "n_contam": pa.array(cnt.astype(np.int64), type=pa.int64()),
        })
    return _p


# above this many distinct benchmark shingles the broadcast side stops
# being "small" (5M strings ~ a few hundred MB replicated per probe
# task) and the plan switches to a distributed semi-join
DECON_BROADCAST_MAX = 5_000_000


def _contam_join_count(t: pa.Table) -> pa.Table:
    """Fused post-kernel of the semi-join plan: per (doc partition),
    count surviving (doc, shingle) rows per doc."""
    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_contam": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return empty
    uv, cnt = np.unique(np.asarray(t.column("doc_id"), dtype=np.int64),
                        return_counts=True)
    return pa.table({
        "doc_id": pa.array(uv, type=pa.int64()),
        "n_contam": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def decontaminate(docs_ds, bench_mod: int = 97,
                  broadcast_max: int = DECON_BROADCAST_MAX):
    """Benchmark decontamination — the held-out-eval overlap check every
    training-data pipeline runs before a model sees the corpus.

    Documents with ``doc_id % bench_mod == 0`` form the benchmark; every
    OTHER document is flagged with the number of its distinct 3-token
    shingles that appear in ANY benchmark document.

    Plan choice by benchmark size (the cost-based switch the engine uses
    everywhere, `FastSV.h:221-228` analog):
    - small benchmark (<= ``broadcast_max`` distinct shingles): built
      with one filtered streaming pass, ``ray.put`` ONCE as a sorted
      string array, probed per batch with a vectorized searchsorted
      membership test — no shuffle touches the corpus side at all.
    - large benchmark: distributed semi-join — exploded (shingle,
      doc_id) rows of the non-benchmark side hash-joined against the
      deduped benchmark shingle table (warm-task co-partitioned join),
      per-doc counts fused into the join task, then one keyed reduce.

    Returns a Dataset of (doc_id, n_contam) rows for contaminated
    documents only."""
    import ray

    from ..core.shuffle import _rt0

    bench_refs = docs_ds.map_batches(
        _bench_shingles(bench_mod), batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_arrow_refs()
    # plan choice from per-part row counts only — the shingle strings
    # themselves reach the driver ONLY if the broadcast plan is chosen
    approx = sum(ray.get([_rt0(_tbl_rows).remote(r) for r in bench_refs]))
    if approx <= broadcast_max:
        arrs = [np.asarray(t.column("s")).astype(str)
                for t in ray.get(bench_refs) if t.num_rows]
        bench = (np.unique(np.concatenate(arrs)) if arrs
                 else np.empty(0, dtype=str))
        bench_ref = ray.put(bench)
        return docs_ds.map_batches(
            _contam_probe(bench_ref, bench_mod), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # scale path: nothing materializes on the driver
    bench_ds = group_apply_tasks(
        ray.data.from_arrow_refs(bench_refs),
        ["s"], _distinct_s,
    ).rename_columns({"s": "shingle"})
    # Ray's filter-expression parser rejects modulo on the left operand
    # (and pyarrow.compute has no mod kernel); numpy mask + Table.filter
    def _nonbench(t: pa.Table, *, _m=bench_mod) -> pa.Table:
        doc = np.asarray(t.column("doc_id"), dtype=np.int64)
        return t.filter(pa.array(doc % _m != 0))

    probe = _exploded_shingles(docs_ds).map_batches(
        _nonbench, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join_tasks(probe, bench_ds, on="shingle",
                             post=_contam_join_count)
    return group_apply_tasks(joined, ["doc_id"], _contam_sum)


def _tbl_rows(t: pa.Table) -> int:
    return t.num_rows


def _distinct_s(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "s" not in t.column_names:
        return pa.table({"s": pa.array([], type=pa.string())})
    return pa.table({
        "s": pa.array(
            np.unique(np.asarray(t.column("s")).astype(str)).tolist(),
            type=pa.string(),
        )
    })


def _contam_sum(t: pa.Table) -> pa.Table:
    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_contam": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return empty
    doc = np.asarray(t.column("doc_id"), dtype=np.int64)
    c = np.asarray(t.column("n_contam"), dtype=np.int64)
    uv, inv = np.unique(doc, return_inverse=True)
    tot = np.zeros(len(uv), dtype=np.int64)
    np.add.at(tot, inv, c)
    return pa.table({
        "doc_id": pa.array(uv, type=pa.int64()),
        "n_contam": pa.array(tot, type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# Cross-document chunk dedup (the paragraph-dedup analog for flat token
# streams): split each doc into consecutive CHUNK_W-token chunks, count
# per doc how many of its chunks also occur in another document.
# ---------------------------------------------------------------------------

CHUNK_W = 8


def _chunk_rows(batch: pa.Table, w: int) -> pa.Table:
    """(chunk_hash, doc_id) per non-overlapping w-token chunk. The chunk
    hash is the same md5+Horner-mod-2^61 rolling hash as `fingerprint`
    restricted to the chunk's tokens, so the DuckDB twin reproduces it
    bit-exactly (both sides group on the HASH — no collision-semantics
    gap). Fully vectorized: one Horner vector step per position j < w."""
    from .text import _FP_MASK, _fp_mulmod, md5_lower64

    toks = tokens_list(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
    empty = pa.table({
        "ch": pa.array([], type=pa.int64()),
        "doc_id": pa.array([], type=pa.int64()),
    })
    if len(flat) == 0:
        return empty
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    nchunks = (lens + w - 1) // w
    total = int(nchunks.sum())
    if total == 0:
        return empty
    cds = np.concatenate(([0], np.cumsum(nchunks)))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(cds, nchunks)
    cstart = np.repeat(offsets, nchunks) + within * w
    clen = np.minimum(w, np.repeat(lens, nchunks) - within * w)
    uniq, inv = np.unique(flat, return_inverse=True)
    hu = np.empty(len(uniq), dtype=np.uint64)
    for i, t in enumerate(uniq):
        hu[i] = md5_lower64(t)
    hv = hu[inv] & _FP_MASK
    h = np.zeros(total, dtype=np.uint64)
    for j in range(w):
        rows = np.nonzero(clen > j)[0]
        if not len(rows):
            break
        h[rows] = (_fp_mulmod(h[rows]) + hv[cstart[rows] + j]) & _FP_MASK
    return pa.table({
        "ch": pa.array(h.astype(np.int64)),
        "doc_id": pa.array(np.repeat(doc, nchunks)),
    })


def _chunk_flag_partial(t: pa.Table) -> pa.Table:
    """Per chunk-hash partition: flag instances whose hash occurs in >1
    distinct doc, then pre-aggregate to per-doc (cnt, dup) partials so
    only O(docs-in-partition) rows re-ship to the doc_id reduce."""
    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_chunks": pa.array([], type=pa.int64()),
        "dup_chunks": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "ch" not in t.column_names:
        return empty
    ch = np.asarray(t.column("ch"), dtype=np.int64)
    doc = np.asarray(t.column("doc_id"), dtype=np.int64)
    order = np.lexsort((doc, ch))
    ch, doc = ch[order], doc[order]
    new_ch = np.empty(len(ch), dtype=bool)
    new_ch[0] = True
    new_ch[1:] = ch[1:] != ch[:-1]
    new_doc = np.empty(len(ch), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = new_ch[1:] | (doc[1:] != doc[:-1])
    grp = np.cumsum(new_ch) - 1
    ndocs = np.bincount(grp, weights=new_doc).astype(np.int64)
    isdup = (ndocs[grp] > 1).astype(np.int64)
    ud, inv = np.unique(doc, return_inverse=True)
    cnt = np.bincount(inv, minlength=len(ud)).astype(np.int64)
    dup = np.zeros(len(ud), dtype=np.int64)
    np.add.at(dup, inv, isdup)
    return pa.table({
        "doc_id": pa.array(ud),
        "n_chunks": pa.array(cnt),
        "dup_chunks": pa.array(dup),
    })


def _chunk_doc_merge(t: pa.Table) -> pa.Table:
    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_chunks": pa.array([], type=pa.int64()),
        "dup_chunks": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return empty
    doc = np.asarray(t.column("doc_id"), dtype=np.int64)
    cnt = np.asarray(t.column("n_chunks"), dtype=np.int64)
    dup = np.asarray(t.column("dup_chunks"), dtype=np.int64)
    ud, inv = np.unique(doc, return_inverse=True)
    c = np.zeros(len(ud), dtype=np.int64)
    d = np.zeros(len(ud), dtype=np.int64)
    np.add.at(c, inv, cnt)
    np.add.at(d, inv, dup)
    return pa.table({
        "doc_id": pa.array(ud),
        "n_chunks": pa.array(c),
        "dup_chunks": pa.array(d),
    })


def chunk_dup_stats(docs_ds, w: int = CHUNK_W):
    """Per-doc cross-document duplicated-chunk stats (doc_id, n_chunks,
    dup_chunks): two warm-task shuffles — (1) chunk-hash routed dup
    flagging with per-doc partials fused into the group task, (2) a
    doc_id keyed sum of the partials. Only (hash, doc_id) int pairs move
    in shuffle 1 and per-doc int triples in shuffle 2; chunk text never
    leaves the extraction task."""
    rows = docs_ds.map_batches(
        lambda b: _chunk_rows(b, w),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    partials = group_apply_tasks(rows, ["ch"], _chunk_flag_partial)
    return group_apply_tasks(partials, ["doc_id"], _chunk_doc_merge)


# ---------------------------------------------------------------------------
# edit-distance-1 vocabulary pairs (SymSpell deletion neighborhood)
# ---------------------------------------------------------------------------

_E1_MAXLEN = 64  # vocabulary words; guard asserts


def _e1_vocab_partial(t: pa.Table) -> pa.Table:
    """Per batch: distinct tokens (the vocabulary partial)."""
    cols = [c for c in ("text",) if c in t.column_names]
    if t.num_rows == 0 or not cols:
        return pa.table({"tok": pa.array([], type=pa.string())})
    toks = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
    u = pc.unique(toks)
    return pa.table({"tok": u.cast(pa.string())})


def _e1_distinct(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or "tok" not in t.column_names:
        return pa.table({"tok": pa.array([], type=pa.string())})
    return pa.table({"tok": pc.unique(t.column("tok")).cast(pa.string())})


def _e1_keys(t: pa.Table) -> pa.Table:
    """Per vocab partition: emit SymSpell keys. Each word w emits
    (k=w, idx=-1) [the original] and (k=del_i(w), idx=i) for every
    single-character deletion, built as vectorized char-matrix column
    drops (one slice per index, no per-word Python). Candidates sharing
    a key are provably levenshtein<=1 (see edit1_pairs)."""
    empty = pa.table({"k": pa.array([], type=pa.string()),
                      "word": pa.array([], type=pa.string()),
                      "idx": pa.array([], type=pa.int64())})
    if t.num_rows == 0 or "tok" not in t.column_names:
        return empty
    words = np.asarray(t.column("tok")).astype(str)
    if not len(words):
        return empty
    L = max(int(np.char.str_len(words).max()), 1)
    if L > _E1_MAXLEN:
        raise NotImplementedError(
            f"edit1_pairs: token length {L} > {_E1_MAXLEN}; widen "
            "_E1_MAXLEN (char matrix is O(N*L))")
    m = np.asarray(words, dtype=f"U{L}").view(np.uint32).reshape(-1, L)
    lens = (m != 0).sum(axis=1)  # no NUL chars in tokens
    ks, ws, ix = [words], [words], [np.full(len(words), -1, np.int64)]
    for i in range(L):
        # deletion at index i exists for words longer than i; the ""
        # key from single-char words is kept — its (key="", idx=0)
        # bucket carries the single-char substitution pairs and is
        # alphabet-bounded, not a mega bucket
        rows = lens > np.int64(i)
        if not rows.any():
            continue
        sub = np.concatenate(
            [m[rows][:, :i], m[rows][:, i + 1:],
             np.zeros((int(rows.sum()), 1), np.uint32)], axis=1)
        ks.append(sub.reshape(-1).view(f"U{L}").reshape(-1).astype(str))
        ws.append(words[rows])
        ix.append(np.full(int(rows.sum()), i, np.int64))
    return pa.table({
        "k": pa.array(np.concatenate(ks).tolist(), type=pa.string()),
        "word": pa.array(np.concatenate(ws).tolist(), type=pa.string()),
        "idx": pa.array(np.concatenate(ix)),
    })


def _e1_pair_kernel(t: pa.Table) -> pa.Table:
    """Per key partition (all rows of a key co-located): emit the exact
    levenshtein-1 pairs. Within one key bucket k:
    - O = the word equal to k (idx=-1; at most one, vocab is distinct),
    - D = words with del_idx(w) == k (len = len(k)+1).
    O x D pairs are one INSERT apart (provable: one deletion aligns the
    strings). D x D pairs sharing the SAME idx differ only at that
    position (equal prefixes and suffixes around idx) -> one
    SUBSTITUTION. No verify pass is needed; dedup is local because a
    key's rows never split across partitions."""
    empty = pa.table({"wa": pa.array([], type=pa.string()),
                      "wb": pa.array([], type=pa.string())})
    if t.num_rows == 0 or "k" not in t.column_names:
        return empty
    k = np.asarray(t.column("k")).astype(str)
    w = np.asarray(t.column("word")).astype(str)
    idx = np.asarray(t.column("idx"), dtype=np.int64)
    pair_a, pair_b = [], []
    # --- insert/delete: deleter rows whose key IS a vocab word ---
    is_orig = idx < 0
    orig_words = np.unique(k[is_orig])  # == the words themselves
    dmask = ~is_orig
    if dmask.any() and len(orig_words):
        dk, dw = k[dmask], w[dmask]
        hit = np.isin(dk, orig_words)
        if hit.any():
            # dedupe (key, word): "aa" deletes to "a" at idx 0 and 1
            cand = np.unique(
                np.char.add(np.char.add(dk[hit], "\x1f"), dw[hit]))
            sp = np.char.partition(cand, "\x1f")
            pair_a.append(sp[:, 0])
            pair_b.append(sp[:, 2])
    # --- substitution: same (key, idx) groups, all pairs ---
    if dmask.any():
        gk = np.char.add(np.char.add(k[dmask], "\x1f"),
                         idx[dmask].astype(str))
        order = np.argsort(gk, kind="stable")
        gs, ws_ = gk[order], w[dmask][order]
        starts = np.flatnonzero(
            np.concatenate([[True], gs[1:] != gs[:-1]]))
        sizes = np.diff(np.concatenate([starts, [len(gs)]]))
        for sz in np.unique(sizes[sizes > 1]):
            base = starts[sizes == sz]
            ii, jj = np.triu_indices(int(sz), k=1)
            a = ws_[(base[:, None] + ii[None, :]).reshape(-1)]
            b = ws_[(base[:, None] + jj[None, :]).reshape(-1)]
            pair_a.append(a)
            pair_b.append(b)
    if not pair_a:
        return empty
    a = np.concatenate(pair_a)
    b = np.concatenate(pair_b)
    lo = np.where(a < b, a, b)
    hi = np.where(a < b, b, a)
    u = np.unique(np.char.add(np.char.add(lo, "\x1f"), hi))
    sp = np.char.partition(u, "\x1f")
    return pa.table({"wa": pa.array(sp[:, 0].tolist(), type=pa.string()),
                     "wb": pa.array(sp[:, 2].tolist(), type=pa.string())})


def edit1_pairs(*token_col_datasets):
    """All unordered vocabulary pairs at levenshtein distance EXACTLY 1,
    via the SymSpell deletion neighborhood (public spell-correction
    technique): every word emits itself and its single-deletion variants
    as keys; two words at distance 1 provably share a key (insert/delete
    -> the shorter word is a deletion of the longer; substitution ->
    both delete the differing index to the same string), and every
    key-sharing candidate is provably at distance <= 1, so there is NO
    quadratic verify stage and no levenshtein evaluation at all. Scale:
    keys shuffle once (O(total chars) rows); bucket sizes are
    alphabet-bounded for the substitution groups. Duplicate-free by
    construction (vocab is distinct; pair dedup is partition-local).

    Args: datasets with a ``tok`` column (pre-tokenized vocabularies,
    possibly overlapping — they are unioned)."""
    ds = token_col_datasets[0]
    for other in token_col_datasets[1:]:
        ds = ds.union(other)
    vocab = group_apply_tasks(ds, ["tok"], _e1_distinct)
    keys = vocab.map_batches(_e1_keys, batch_format="pyarrow",
                             zero_copy_batch=True)
    return group_apply_tasks(keys, ["k"], _e1_pair_kernel)


# ---------------------------------------------------------------------------
# Levenshtein-2 pairs: SymSpell depth-2 deletion neighborhood + exact
# vectorized DP verify
# ---------------------------------------------------------------------------

_L2_BUCKET_CAP = 200_000  # loud tripwire: C(bucket, 2) candidate pairs


def _l2_keys(t: pa.Table) -> pa.Table:
    """Per vocab partition: depth-<=2 deletion keys. Each word emits
    itself, every single deletion, and every ordered double deletion
    (i < j), built as vectorized char-matrix column drops. Two words at
    levenshtein distance <= 2 provably share a key (align the edit
    script: each side deletes the <= 2 positions it does not share);
    sharing a key only bounds the distance by 4, so a verify stage
    follows — the depth-2 SymSpell contract."""
    empty = pa.table({"k": pa.array([], type=pa.string()),
                      "word": pa.array([], type=pa.string())})
    if t.num_rows == 0 or "tok" not in t.column_names:
        return empty
    words = np.asarray(t.column("tok")).astype(str)
    if not len(words):
        return empty
    L = max(int(np.char.str_len(words).max()), 1)
    if L > _E1_MAXLEN:
        raise NotImplementedError(
            f"lev2_pairs: token length {L} > {_E1_MAXLEN}; widen "
            "_E1_MAXLEN (char matrix is O(N*L^2))")
    m = np.asarray(words, dtype=f"U{L}").view(np.uint32).reshape(-1, L)
    lens = (m != 0).sum(axis=1)
    ks, ws = [words], [words]

    def _emit(drop: tuple, minlen: int):
        rows = lens >= np.int64(minlen)
        if not rows.any():
            return
        keep_cols = [c for c in range(L) if c not in drop]
        sub = m[rows][:, keep_cols] if keep_cols else \
            np.zeros((int(rows.sum()), 0), dtype=np.uint32)
        pad = np.zeros((sub.shape[0], len(drop)), dtype=np.uint32)
        kk = np.ascontiguousarray(
            np.concatenate((sub, pad), axis=1)).view(f"U{L}").ravel()
        ks.append(kk.astype(str))
        ws.append(words[rows])

    for i in range(L):
        _emit((i,), i + 1)
        for j in range(i + 1, L):
            _emit((i, j), j + 1)
    return pa.table({"k": pa.array(np.concatenate(ks), type=pa.string()),
                     "word": pa.array(np.concatenate(ws),
                                      type=pa.string())})


def _l2_cand_kernel(t: pa.Table) -> pa.Table:
    """Per key partition: unordered candidate pairs per key bucket
    (partition-local dedup; global dedup happens in the verify stage).
    A degenerate bucket raises loudly instead of emitting a quadratic
    surprise (the DF_CAP discipline of the Jaccard posting path)."""
    empty = pa.table({"wa": pa.array([], type=pa.string()),
                      "wb": pa.array([], type=pa.string())})
    if t.num_rows == 0 or "k" not in t.column_names:
        return empty
    k = np.asarray(t.column("k")).astype(str)
    w = np.asarray(t.column("word")).astype(str)
    # distinct (k, word) first: one word reaches one key many ways
    kw = np.unique(np.char.add(np.char.add(k, "\x1f"), w))
    sp = np.char.partition(kw, "\x1f")
    k, w = sp[:, 0], sp[:, 2]
    order = np.argsort(k, kind="stable")
    k, w = k[order], w[order]
    new = np.empty(len(k), dtype=bool)
    if len(k):
        new[0] = True
        new[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.concatenate((starts, [len(k)])))
    if ((sizes * (sizes - 1)) // 2).sum() > _L2_BUCKET_CAP:
        raise OverflowError(
            "lev2_pairs: candidate bucket blow-up past "
            f"{_L2_BUCKET_CAP}; stratify the hot keys")
    pa_, pb_ = [], []
    for s, z in zip(starts, sizes):
        if z < 2:
            continue
        ww = np.sort(w[s:s + z])
        ia, ib = np.triu_indices(z, 1)
        pa_.append(ww[ia])
        pb_.append(ww[ib])
    if not pa_:
        return empty
    return pa.table({"wa": pa.array(np.concatenate(pa_),
                                    type=pa.string()),
                     "wb": pa.array(np.concatenate(pb_),
                                    type=pa.string())})


def _lev_dist_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact Levenshtein distances for a BATCH of string pairs: the
    classic DP run once with every row vectorized across the pair axis
    (O(La*Lb) numpy ops total, no per-pair Python DP)."""
    p = len(a)
    if p == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.char.str_len(a).astype(np.int64)
    lb = np.char.str_len(b).astype(np.int64)
    ga, gb = max(int(la.max()), 1), max(int(lb.max()), 1)
    ea = np.ascontiguousarray(np.asarray(a, dtype=f"U{ga}")) \
        .view(np.uint32).reshape(p, ga)
    eb = np.ascontiguousarray(np.asarray(b, dtype=f"U{gb}")) \
        .view(np.uint32).reshape(p, gb)
    prev = np.tile(np.arange(gb + 1, dtype=np.int64), (p, 1))
    for i in range(1, ga + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = (ea[:, i - 1][:, None] != eb).astype(np.int64)
        cur[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub)
        for j in range(1, gb + 1):
            np.minimum(cur[:, j], cur[:, j - 1] + 1, out=cur[:, j])
        done = la < i  # shorter words: answer already in their row la
        if done.any():
            cur[done] = prev[done]
        prev = cur
    return prev[np.arange(p), lb]


def _l2_verify_kernel(t: pa.Table) -> pa.Table:
    """Per pair-hash partition: global pair dedup + exact DP verify,
    keep distance EXACTLY 2 (distance-1 pairs are `edit1_pairs`)."""
    empty = pa.table({"wa": pa.array([], type=pa.string()),
                      "wb": pa.array([], type=pa.string())})
    if t.num_rows == 0 or "wa" not in t.column_names:
        return empty
    cand = np.unique(np.char.add(
        np.char.add(np.asarray(t.column("wa")).astype(str), "\x1f"),
        np.asarray(t.column("wb")).astype(str)))
    if not len(cand):
        return empty
    sp = np.char.partition(cand, "\x1f")
    wa, wb = sp[:, 0], sp[:, 2]
    d = _lev_dist_batch(wa, wb)
    keep = d == 2
    return pa.table({"wa": pa.array(wa[keep], type=pa.string()),
                     "wb": pa.array(wb[keep], type=pa.string())})


def lev2_pairs(*token_col_datasets):
    """All unordered vocabulary pairs at levenshtein distance EXACTLY 2
    — depth-2 SymSpell: deletion-neighborhood blocking (keys shuffle
    once), candidate pairs per shared key, pair-hash global dedup, then
    one exact vectorized-DP verify per surviving candidate (sharing a
    depth-2 key bounds the distance by 4, so unlike `edit1_pairs` the
    verify stage is load-bearing). Fuzzy-match dedup one edit wider
    than the SymSpell-1 operator."""
    ds = token_col_datasets[0]
    for other in token_col_datasets[1:]:
        ds = ds.union(other)
    vocab = group_apply_tasks(ds, ["tok"], _e1_distinct)
    keys = vocab.map_batches(_l2_keys, batch_format="pyarrow",
                             zero_copy_batch=True)
    cands = group_apply_tasks(keys, ["k"], _l2_cand_kernel)
    return group_apply_tasks(cands, ["wa", "wb"], _l2_verify_kernel)
