"""Text-analysis stages for large-scale training-data pipelines.

All operators are Ray Data `map_batches` transforms over the `documents`
table. Tokenization uses Arrow kernels (`split_pattern` -> list arrays);
per-token statistics flatten to numpy with parent offsets — no per-row
Python anywhere (shingle assembly is one Arrow join over shifted flat
slices, see `functions/dedup._flat_distinct_shingles`).

Deterministic definitions (shared verbatim by the DuckDB oracles):
- tokens       = text split on single space, empties kept
- shingles     = token 3-grams joined by ' '
- langid       = argmax over marker-token counts, tie -> alphabetically
                 first language
- quality      = distinct-token ratio + average token length (round 6)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.shuffle import (group_apply_tasks, group_reduce_per_key,
                            group_sum_per_key)
from ..util import ibincount

LANG_MARKERS = {
    "de": "sort",
    "en": "the",
    "es": "data",
    "fr": "join",
    "zh": "batch",
}


def tokens_list(batch: pa.Table) -> pa.ListArray:
    return pc.split_pattern(batch.column("text"), " ")


def token_stats(batch: pa.Table) -> pa.Table:
    toks = tokens_list(batch)
    n_tokens = pc.list_value_length(toks)
    n_chars = pc.utf8_length(batch.column("text"))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars_calc": pc.cast(n_chars, pa.int64()),
        }
    )


def langid(batch: pa.Table) -> pa.Table:
    toks = tokens_list(batch)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    nrows = batch.num_rows
    langs = sorted(LANG_MARKERS)  # alphabetical: tie -> first
    counts = np.zeros((len(langs), nrows), dtype=np.int64)
    par = np.asarray(parents)
    for li, lang in enumerate(langs):
        hit = np.asarray(pc.equal(flat, LANG_MARKERS[lang]))
        if hit.any():
            counts[li] = np.bincount(par[hit], minlength=nrows)
    best = counts.argmax(axis=0)  # first max -> alphabetically first lang
    pred = np.array(langs, dtype=object)[best]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(pred.tolist(), type=pa.string()),
        }
    )


def quality(batch: pa.Table) -> pa.Table:
    toks = tokens_list(batch)
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    par = np.asarray(pc.list_parent_indices(toks))
    nrows = batch.num_rows
    n_tokens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    # distinct tokens per row: sort (parent, token) then count boundaries
    order = np.lexsort((flat, par))
    sp, st = par[order], flat[order]
    new = np.ones(len(sp), dtype=bool)
    new[1:] = (sp[1:] != sp[:-1]) | (st[1:] != st[:-1])
    n_distinct = np.bincount(sp[new], minlength=nrows)
    tok_lens = np.char.str_len(flat)
    charsum = np.bincount(par, weights=tok_lens, minlength=nrows)
    with np.errstate(divide="ignore", invalid="ignore"):
        distinct_ratio = np.round(n_distinct / np.maximum(n_tokens, 1), 6)
        avg_tok_len = np.round(charsum / np.maximum(n_tokens, 1), 6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "distinct_ratio": pa.array(distinct_ratio),
            "avg_tok_len": pa.array(avg_tok_len),
        }
    )


_FP_MASK = np.uint64((1 << 61) - 1)
_FP_MULT = np.uint64(1000003)


def _fp_mulmod(h: np.ndarray) -> np.ndarray:
    """h * 1000003 mod 2^61, exact in uint64: split h = hi*2^41 + lo so
    both partial products fit, recombine under the power-of-two mask."""
    hi = h >> np.uint64(41)          # < 2^20
    lo = h & np.uint64((1 << 41) - 1)  # < 2^41
    part = ((hi * _FP_MULT) & np.uint64((1 << 20) - 1)) << np.uint64(41)
    return (part + lo * _FP_MULT) & _FP_MASK


def md5_lower64(t: str) -> int:
    """Low 64 bits of md5 = DuckDB's ``md5_number_lower`` exactly
    (little-endian uint64 of the digest's last 8 bytes) — the token hash
    basis shared by `fingerprint` and `simhash` so both have bit-exact
    SQL oracles."""
    import hashlib
    import struct

    return struct.unpack("<Q", hashlib.md5(t.encode()).digest()[8:])[0]


def fingerprint(batch: pa.Table) -> pa.Table:
    """Rolling polynomial hash over token hashes (document fingerprint):
    h = (h * 1000003 + (md5_lower64(token) mod 2^61)) mod 2^61,
    Horner-evaluated COLUMN-WISE — one vector step per token position
    instead of a Python loop per token; each distinct token is hashed
    once. md5-based so the DuckDB oracle (`sqlgen.fingerprint`:
    list_transform + list_reduce in HUGEINT) reproduces it bit-exactly."""
    toks = tokens_list(batch)
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    nrows = batch.num_rows
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    h = np.zeros(nrows, dtype=np.uint64)
    if len(flat):
        uniq, inv = np.unique(flat, return_inverse=True)
        hu = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            hu[i] = md5_lower64(t)
        hv = hu[inv] & _FP_MASK
        for j in range(int(lens.max())):
            rows = np.nonzero(lens > j)[0]
            h[rows] = (_fp_mulmod(h[rows]) + hv[offsets[rows] + j]) & _FP_MASK
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(h.astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# vocabulary construction
# ---------------------------------------------------------------------------


def _vocab_local(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: local token value_counts (the partial
    pre-aggregation that keeps the keyed shuffle small)."""
    vc = pc.list_flatten(tokens_list(batch)).value_counts()
    return pa.table({
        "tok": vc.field("values"),
        "cnt": pc.cast(vc.field("counts"), pa.int64()),
    })


def _topk_table(tok: np.ndarray, cnt: np.ndarray, k: int) -> pa.Table:
    """Shared exact top-k cut (count DESC, token ASC): the partition
    winners and the global winner MUST use the identical total order."""
    order = np.lexsort((tok, -cnt))[:k]
    return pa.table({
        "tok": pa.array(tok[order].tolist(), type=pa.string()),
        "cnt": pa.array(cnt[order], type=pa.int64()),
    })


_VOCAB_EMPTY = {"tok": np.empty(0, dtype=str),
                "cnt": np.empty(0, dtype=np.int64)}


def _vocab_merge_topk(k: int):
    def _m(t: pa.Table) -> pa.Table:
        # shuffle merge fns run on empty partitions for schema stability;
        # zero-column blocks can reach here from schema-less upstreams
        if t.num_rows == 0 or "tok" not in t.column_names:
            return _topk_table(_VOCAB_EMPTY["tok"], _VOCAB_EMPTY["cnt"], k)
        agg = t.group_by("tok").aggregate([("cnt", "sum")])
        tok = np.asarray(agg.column("tok")).astype(str)
        cnt = np.asarray(agg.column("cnt_sum"), dtype=np.int64)
        return _topk_table(tok, cnt, k)
    return _m


def vocab_topk(docs_ds, k: int = 100,
               num_partitions: int | None = None) -> pa.Table:
    """Global token-frequency top-k (count DESC, token ASC — a total
    order, so the cut is deterministic): the vocabulary-construction
    step of a BPE/tokenizer training pipeline.

    Scale shape: per-batch value_counts combiner -> ONE warm-task keyed
    shuffle of (token, partial count) rows -> per-partition exact top-k
    partials (complete counts after the shuffle) -> driver merges g*k
    rows. The full vocabulary never sits in one place; the driver sees
    only g*k rows."""
    import ray

    partials = docs_ds.map_batches(
        _vocab_local, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = group_apply_tasks(partials, ["tok"], _vocab_merge_topk(k),
                               num_partitions=num_partitions)
    t = pa.concat_tables(
        [r for r in ray.get(merged.to_arrow_refs()) if r.num_rows]
        or [pa.table({"tok": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})]
    )
    tok = np.asarray(t.column("tok")).astype(str)
    cnt = np.asarray(t.column("cnt"), dtype=np.int64)
    return _topk_table(tok, cnt, k)


CM_D = 4  # sketch depth (hash rows)
CM_W = 512  # sketch width per row (power of two -> bucket = slice & mask)


def _cm_local(batch: pa.Table) -> pa.Table:
    """Per-batch partial Count-Min sketch as (r, b, cnt) rows: local
    token value_counts, md5-low-64 per DISTINCT token (hashed once, not
    per occurrence), row r's bucket = bits [16r, 16r+9) of the hash."""
    vc = pc.list_flatten(tokens_list(batch)).value_counts()
    uniq = np.asarray(vc.field("values")).astype(str)
    counts = np.asarray(vc.field("counts"), dtype=np.int64)
    hu = np.fromiter((md5_lower64(t) for t in uniq), dtype=np.uint64,
                     count=len(uniq))
    rs, bs, cs = [], [], []
    for r in range(CM_D):
        b = ((hu >> np.uint64(16 * r)) & np.uint64(CM_W - 1)).astype(
            np.int64)
        tab = np.zeros(CM_W, dtype=np.int64)
        np.add.at(tab, b, counts)
        nz = np.nonzero(tab)[0]
        rs.append(np.full(len(nz), r, dtype=np.int64))
        bs.append(nz)
        cs.append(tab[nz])
    return pa.table({
        "r": pa.array(np.concatenate(rs) if rs else
                      np.empty(0, dtype=np.int64)),
        "b": pa.array(np.concatenate(bs) if bs else
                      np.empty(0, dtype=np.int64)),
        "cnt": pa.array(np.concatenate(cs) if cs else
                        np.empty(0, dtype=np.int64)),
    })


def _cm_merge(t: pa.Table) -> pa.Table:
    key = (np.asarray(t.column("r"), dtype=np.int64) * CM_W
           + np.asarray(t.column("b"), dtype=np.int64))
    uk, s = group_sum_per_key(
        np.asarray(t.column("cnt"), dtype=np.float64), key)
    return pa.table({
        "r": pa.array(uk // CM_W),
        "b": pa.array(uk % CM_W),
        "cnt": pa.array(s.astype(np.int64)),
    })


def countmin_sketch(docs_ds):
    """Count-Min sketch of corpus token frequencies (Cormode-Muthukrishnan
    sketch; depth CM_D, width CM_W). The sketch is LINEAR, so it builds
    as per-batch partial sketches merged by plain + — one streaming
    map_batches pass and a keyed reduce of at most CM_D*CM_W rows; no
    token strings survive the shuffle. Hash rows are byte slices of the
    md5-low-64 token hash (DuckDB-reproducible: md5_number_lower >> 16r
    & 511, same trick as `fingerprint`/`simhash`). Returns a Dataset
    (r, b, cnt) of nonzero sketch cells; exact integers, so the whole
    sketch is oracle-hashable. Point estimates via `countmin_estimate`."""
    partials = docs_ds.map_batches(_cm_local, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return group_apply_tasks(partials, ["r", "b"], _cm_merge)


def countmin_estimate(sketch: pa.Table, tokens: list) -> np.ndarray:
    """est(token) = min over rows of the token's bucket count (the CM
    upper-bound estimator: est >= true, est <= true + eps*N w.h.p.)."""
    tab = np.zeros((CM_D, CM_W), dtype=np.int64)
    tab[np.asarray(sketch.column("r"), dtype=np.int64),
        np.asarray(sketch.column("b"), dtype=np.int64)] = np.asarray(
        sketch.column("cnt"), dtype=np.int64)
    hu = np.fromiter((md5_lower64(t) for t in tokens), dtype=np.uint64,
                     count=len(tokens))
    ests = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CM_D):
        b = ((hu >> np.uint64(16 * r)) & np.uint64(CM_W - 1)).astype(
            np.int64)
        ests = np.minimum(ests, tab[r, b])
    return ests


# ---------------------------------------------------------------------------
# HyperLogLog distinct-token sketch
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^p registers
HLL_M = 1 << HLL_P
_HLL_RESTBITS = 52  # rest = hash bits [p, p+52) -> rho in [1, 53]


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount of a uint64 vector (numpy 1.x has no bitwise_count)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64)


def _hll_local(batch: pa.Table) -> pa.Table:
    """Per-batch partial HLL registers (b, r): bucket = low HLL_P hash
    bits, rho = 1 + trailing-zero count of the next 52 bits (0 -> 53).
    Registers are MAXes, so per-batch partials over batch-DISTINCT
    tokens merge exactly (max is idempotent + commutative) — the sketch
    build is one streaming pass + a <=HLL_M-row keyed max reduce."""
    uniq = np.asarray(pc.unique(pc.list_flatten(tokens_list(batch)))
                      ).astype(str)
    hu = np.fromiter((md5_lower64(t) for t in uniq), dtype=np.uint64,
                     count=len(uniq))
    b = (hu & np.uint64(HLL_M - 1)).astype(np.int64)
    rest = ((hu >> np.uint64(HLL_P))
            & np.uint64((1 << _HLL_RESTBITS) - 1)).astype(np.int64)
    lsb = (rest & -rest).astype(np.uint64)  # 2^tz exactly (0 when rest=0)
    rho = np.where(rest > 0, _popcount64(lsb - np.uint64(1)) + 1,
                   _HLL_RESTBITS + 1)
    tab = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(tab, b, rho)
    nz = np.nonzero(tab)[0]
    return pa.table({"b": pa.array(nz), "r": pa.array(tab[nz])})


def _hll_merge(t: pa.Table) -> pa.Table:
    uk, mx = group_reduce_per_key(
        np.asarray(t.column("r"), dtype=np.float64),
        np.asarray(t.column("b"), dtype=np.int64), "max")
    return pa.table({"b": pa.array(uk.astype(np.int64)),
                     "r": pa.array(mx.astype(np.int64))})


def hll_registers(docs_ds):
    """HyperLogLog registers over corpus tokens (Flajolet et al. 2007):
    the (b, r) nonzero-register table, integer-exact and therefore
    oracle-hashable (the estimate is a deterministic driver-side formula
    over these <=2^p rows, `hll_estimate`). md5-low-64 hashing shared
    with `fingerprint`/`countmin_sketch` so the DuckDB twin
    (md5_number_lower + bit_count) is bit-exact."""
    partials = docs_ds.map_batches(_hll_local, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return group_apply_tasks(partials, ["b"], _hll_merge)


def hll_estimate(registers: pa.Table) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (deterministic given the registers)."""
    tab = np.zeros(HLL_M, dtype=np.int64)
    tab[np.asarray(registers.column("b"), dtype=np.int64)] = np.asarray(
        registers.column("r"), dtype=np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M / np.sum(np.ldexp(1.0, -tab))
    zeros = int(np.sum(tab == 0))
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document
# ---------------------------------------------------------------------------

TFIDF_K = 3
TFIDF_SCALE = 1_000_000


def _tf_local(batch: pa.Table) -> pa.Table:
    """Per-batch exact (doc_id, tok, tf): a document's text is one row,
    so per-batch term counts are globally exact — no tf shuffle at all
    (the classic combiner-free layout of doc-partitioned corpora)."""
    toks = tokens_list(batch)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    doc = np.repeat(np.asarray(batch.column("doc_id"), dtype=np.int64),
                    lens)
    if len(flat) == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "tok": pa.array([], type=pa.string()),
                         "tf": pa.array([], type=pa.int64())})
    order = np.lexsort((flat, doc))
    d, t = doc[order], flat[order]
    new = np.empty(len(d), dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
    starts = np.nonzero(new)[0]
    tf = np.diff(np.concatenate((starts, [len(d)])))
    return pa.table({"doc_id": pa.array(d[starts]),
                     "tok": pa.array(t[starts], type=pa.string()),
                     "tf": pa.array(tf.astype(np.int64))})


def _df_merge(t: pa.Table) -> pa.Table:
    """(tok, df) for one tok-hash partition — df = #docs containing tok
    (rows of the (doc, tok)-unique tf table)."""
    tok = np.asarray(t.column("tok")).astype(str)
    uk, inv = np.unique(tok, return_inverse=True)
    df = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    return pa.table({"tok": pa.array(uk, type=pa.string()),
                     "df": pa.array(df)})


def tfidf_topk(docs_ds, k: int = TFIDF_K):
    """Top-k terms per document by integer tf-idf score
    ``tf * ((N * TFIDF_SCALE) // df)`` (ties broken by term asc) — the
    rational-idf variant keeps every value an exact int64 so the ranking
    (and the oracle hash) is float-free. Plan: per-batch exact tf (docs
    are row-atomic) -> tok-hash df reduce -> co-partitioned tok join with
    the score fused into the join task -> doc-hash top-k cut. int64-safe
    while N * TFIDF_SCALE < 2^63 (N < ~9.2e12 docs)."""
    from ..core.shuffle import hash_join_tasks

    n_docs = int(docs_ds.count())
    tf = docs_ds.map_batches(_tf_local, batch_format="pyarrow",
                             zero_copy_batch=True)
    tf = tf.materialize()  # consumed twice: df reduce + join
    df = group_apply_tasks(tf, ["tok"], _df_merge)

    idf_num = n_docs * TFIDF_SCALE

    def _score(joined: pa.Table) -> pa.Table:
        tfv = np.asarray(joined.column("tf"), dtype=np.int64)
        dfv = np.asarray(joined.column("df"), dtype=np.int64)
        score = tfv * (idf_num // np.where(dfv == 0, 1, dfv))
        return joined.append_column("score", pa.array(score))

    scored = hash_join_tasks(tf, df, on="tok", post=_score)

    def _topk(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("doc_id"), dtype=np.int64)
        tok = np.asarray(t.column("tok")).astype(str)
        s = np.asarray(t.column("score"), dtype=np.int64)
        order = np.lexsort((tok, -s, d))
        d_o = d[order]
        new = np.empty(len(d_o), dtype=bool)
        if len(d_o):
            new[0] = True
            new[1:] = d_o[1:] != d_o[:-1]
        starts = np.nonzero(new)[0]
        grp = np.cumsum(new) - 1
        rank = np.arange(len(d_o)) - starts[grp]
        keep = order[rank < k]
        return t.take(pa.array(keep))

    return group_apply_tasks(scored, ["doc_id"], _topk)


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

# per-language keep quota out of 100 (language-balancing downsample: the
# over-represented language is cut hardest)
SAMPLE_QUOTA = {"en": 25, "de": 60, "es": 60, "fr": 60, "zh": 60}
_SAMPLE_A = 48271  # LCG multiplier (MINSTD), exact in int64 for id < 2^47
_SAMPLE_B = 11


def _sample_filter(batch: pa.Table, *, quota: dict, default: int) -> pa.Table:
    doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
    lang = np.asarray(batch.column("lang")).astype(str)
    if len(doc) and (
        int(doc.max()) > (2**63 - 1 - _SAMPLE_B) // _SAMPLE_A
        or int(doc.min()) < 0
    ):
        # numpy would wrap int64 silently past the positive domain, and
        # on NEGATIVE ids numpy's non-negative modulo diverges from the
        # SQL twin's sign-of-dividend modulo — refuse both, matching the
        # mis_fixed/matching_fixed guards
        raise NotImplementedError(
            "sample_stratified: doc_id outside the exact non-negative "
            "int64 domain of the (id * 48271 + 11) % 100 hash"
        )
    h = (doc * _SAMPLE_A + _SAMPLE_B) % 100
    q = np.full(len(doc), default, dtype=np.int64)
    for lg, rate in quota.items():
        q[lang == lg] = rate
    keep = h < q
    return pa.table({
        "doc_id": pa.array(doc[keep], type=pa.int64()),
        "lang": pa.array(lang[keep].tolist(), type=pa.string()),
    })


def sample_stratified(docs_ds, quota: dict | None = None,
                      default: int = 50):
    """Deterministic per-language stratified downsample — the
    language-balancing step of a corpus-mixing pipeline. Keep a document
    iff ``(doc_id * 48271 + 11) %% 100 < quota[lang]`` — a seeded LCG
    residue, so the sample is REPRODUCIBLE and resumable (re-running any
    shard selects the same rows; no RNG state to checkpoint) and exactly
    SQL-replicable. One streaming map_batches, no shuffle. Expects
    columns (doc_id, lang); returns (doc_id, lang) of the kept rows."""
    from functools import partial

    q = quota or SAMPLE_QUOTA
    return docs_ds.map_batches(
        partial(_sample_filter, quota=q, default=default),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# regex redaction (PII-scrub machinery)
# ---------------------------------------------------------------------------

# default pattern classes: SSN-like, email-like, plus one marker token
# class that actually occurs in the synthetic corpus (so the machinery is
# exercised end-to-end); both engines run RE2, so semantics are identical
REDACT_PATTERNS = (
    r"\b\d{3}-\d{2}-\d{4}\b",
    r"[A-Za-z0-9._]+@[A-Za-z0-9.]+",
    r"\bspark\b",
)
REDACT_REPL = "[REDACTED]"


class Redactor:
    """Actor-pool redaction stage — the PII-scrub step of a training-data
    pipeline as a stateful callable class: pattern set fixed ONCE in
    ``__init__`` (per actor), per-batch work is two vectorized Arrow RE2
    kernels per pattern (`count_substring_regex` + `replace_substring_
    regex`). Use with ``docs.map_batches(Redactor, concurrency=N,
    batch_format="pyarrow")``. Emits (doc_id, clean, n_redact)."""

    def __init__(self, patterns=REDACT_PATTERNS, repl: str = REDACT_REPL):
        self.patterns = tuple(patterns)
        self.repl = repl

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = np.zeros(batch.num_rows, dtype=np.int64)
        for p in self.patterns:
            n += np.asarray(
                pc.count_substring_regex(text, pattern=p), dtype=np.int64
            )
            text = pc.replace_substring_regex(
                text, pattern=p, replacement=self.repl
            )
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "clean": text,
            "n_redact": pa.array(n, type=pa.int64()),
        })


def redact(docs_ds, patterns=REDACT_PATTERNS, repl: str = REDACT_REPL,
           concurrency: int = 2):
    """Streaming redaction over the documents table (see `Redactor`)."""
    return docs_ds.map_batches(
        Redactor, fn_constructor_kwargs={"patterns": patterns,
                                         "repl": repl},
        concurrency=concurrency, batch_format="pyarrow",
    )


def _bigram_local(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: local bigram value_counts (consecutive token
    pairs within a doc, space-joined) — vectorized via flat tokens +
    parent indices; the pair string is built by one np.char.add."""
    toks = tokens_list(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    empty = pa.table({"tok": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if len(flat) < 2:
        return empty
    same = par[1:] == par[:-1]
    if not same.any():
        return empty
    bi = np.char.add(np.char.add(flat[:-1][same], " "), flat[1:][same])
    u, cnt = np.unique(bi, return_counts=True)
    return pa.table({
        "tok": pa.array(u.tolist(), type=pa.string()),
        "cnt": pa.array(cnt.astype(np.int64)),
    })


def bigram_topk(docs_ds, k: int = 100,
                num_partitions: int | None = None) -> pa.Table:
    """Global bigram-frequency top-k (collocation extraction — the
    phrase-vocabulary step of tokenizer/merge-rule training). Same
    scale shape as `vocab_topk`: per-batch combiner -> one warm-task
    keyed shuffle -> per-partition exact top-k partials -> driver
    merges g*k rows."""
    import ray

    partials = docs_ds.map_batches(
        _bigram_local, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = group_apply_tasks(partials, ["tok"], _vocab_merge_topk(k),
                               num_partitions=num_partitions)
    t = pa.concat_tables(
        [r for r in ray.get(merged.to_arrow_refs()) if r.num_rows]
        or [pa.table({"tok": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})]
    )
    tok = np.asarray(t.column("tok")).astype(str)
    cnt = np.asarray(t.column("cnt"), dtype=np.int64)
    return _topk_table(tok, cnt, k)


# ---------------------------------------------------------------------------
# Repetition-ratio quality (Gopher-style duplicate-n-gram stats)
# ---------------------------------------------------------------------------


def rep_ngram_stats(batch: pa.Table, w: int = 3) -> pa.Table:
    """Per-doc repetition statistics: total w-grams, distinct w-grams,
    duplicated w-grams (total - distinct) and the max single-token
    multiplicity — the duplicate-n-gram quality filter of large-corpus
    cleaning pipelines. Docs are row-atomic, so this is one vectorized
    streaming pass (flat tokens + parent indices; no shuffle):
    w-gram identity = the space-joined token string, exactly what the
    SQL twin's list-slice array_to_string produces."""
    toks = tokens_list(batch)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    doc_id = np.asarray(batch.column("doc_id"), dtype=np.int64)
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    ndoc = len(doc_id)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    t_w = np.maximum(lens - (w - 1), 0)
    d_w = np.zeros(ndoc, dtype=np.int64)
    maxtok = np.zeros(ndoc, dtype=np.int64)
    if len(flat):
        # max token multiplicity per doc
        key = np.char.add(np.char.add(par.astype(str), "\x1f"), flat)
        _, inv, cnts = np.unique(key, return_inverse=True,
                                 return_counts=True)
        np.maximum.at(maxtok, par, cnts[inv])
        # distinct w-grams per doc
        if len(flat) >= w:
            ok = np.ones(len(flat) - (w - 1), dtype=bool)
            gram = flat[: len(flat) - (w - 1)]
            for j in range(1, w):
                sl = slice(j, len(flat) - (w - 1) + j)
                ok &= par[sl] == par[: len(flat) - (w - 1)]
                gram = np.char.add(np.char.add(gram, " "), flat[sl])
            gpar = par[: len(flat) - (w - 1)][ok]
            gram = gram[ok]
            gk = np.unique(
                np.char.add(np.char.add(gpar.astype(str), "\x1f"), gram))
            gp = np.fromiter((int(x.split("\x1f", 1)[0]) for x in gk),
                             dtype=np.int64, count=len(gk))
            np.add.at(d_w, gp, 1)
    return pa.table({
        "doc_id": pa.array(doc_id),
        "total_w": pa.array(t_w),
        "distinct_w": pa.array(d_w),
        "dup_w": pa.array(t_w - d_w),
        "maxtok": pa.array(maxtok),
    })


# ---------------------------------------------------------------------------
# Collocation lift (association-scored bigrams)
# ---------------------------------------------------------------------------


COLLOC_SCALE = 1_000_000_000_000  # cab * 10^12 // (ca * cb)


def colloc_lift_topk(docs_ds, k: int = 50, min_count: int = 5,
                     num_partitions: int | None = None) -> pa.Table:
    """Top-k bigrams by integer association score
    cab * 10^12 // (ca * cb) with cab >= min_count — lift up to the
    constant N^2/Nb factor, division-free and SQL-exact. Unigram and
    bigram counts ride the SAME per-batch combiner pass; both reduce
    by token hash; the bigram side then joins its two unigram counts
    (co-partitioned warm-task joins) and the driver sees only the
    thresholded candidates. int64-safe while cab < 9.2e6."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    def _local(batch: pa.Table) -> pa.Table:
        toks = tokens_list(batch)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        out = {"a": [], "b": [], "cnt": []}
        empty = pa.table({"a": pa.array([], type=pa.string()),
                          "b": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        u1, c1 = np.unique(flat, return_counts=True)
        tabs = [pa.table({"a": pa.array(u1.tolist(), type=pa.string()),
                          "b": pa.array([""] * len(u1), type=pa.string()),
                          "cnt": pa.array(c1.astype(np.int64))})]
        if len(flat) >= 2:
            same = par[1:] == par[:-1]
            if same.any():
                bi = np.char.add(np.char.add(flat[:-1][same], "\x1f"),
                                 flat[1:][same])
                u2, c2 = np.unique(bi, return_counts=True)
                ab = np.array([x.split("\x1f", 1) for x in u2])
                tabs.append(pa.table({
                    "a": pa.array(ab[:, 0].tolist(), type=pa.string()),
                    "b": pa.array(ab[:, 1].tolist(), type=pa.string()),
                    "cnt": pa.array(c2.astype(np.int64)),
                }))
        return pa.concat_tables(tabs)

    def _sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        g = t.group_by(["a", "b"]).aggregate([("cnt", "sum")])
        return pa.table({"a": g.column("a"), "b": g.column("b"),
                         "cnt": g.column("cnt_sum")})

    counts = group_apply_tasks(
        docs_ds.map_batches(_local, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["a"], _sum, num_partitions=num_partitions)
    # split: unigrams (b == "") vs thresholded bigram candidates
    uni = counts.map_batches(
        lambda t: pa.table({
            "tok": t.column("a").filter(pc.equal(t.column("b"), "")),
            "c": t.column("cnt").filter(pc.equal(t.column("b"), "")),
        }), batch_format="pyarrow")

    def _cand(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.not_equal(t.column("b"), ""),
                    pc.greater_equal(t.column("cnt"), min_count))
        return pa.table({"a": t.column("a").filter(m),
                         "b": t.column("b").filter(m),
                         "cab": t.column("cnt").filter(m)})

    cand = counts.map_batches(_cand, batch_format="pyarrow")
    ja = hash_join_tasks(cand, uni, on="a", right_on="tok",
                         num_partitions=num_partitions,
                         post=lambda t: pa.table({
                             "a": t.column("a"), "b": t.column("b"),
                             "cab": t.column("cab"),
                             "ca": t.column("c")}))
    jb = hash_join_tasks(ja, uni, on="b", right_on="tok",
                         num_partitions=num_partitions,
                         post=lambda t: pa.table({
                             "a": t.column("a"), "b": t.column("b"),
                             "cab": t.column("cab"),
                             "ca": t.column("ca"),
                             "cb": t.column("c")}))
    import ray as _ray

    tabs = [r for r in _ray.get(jb.to_arrow_refs()) if r.num_rows]
    if not tabs:
        return pa.table({"a": pa.array([], type=pa.string()),
                         "b": pa.array([], type=pa.string()),
                         "cab": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.int64())})
    t = pa.concat_tables(tabs)
    a = np.asarray(t.column("a")).astype(str)
    b = np.asarray(t.column("b")).astype(str)
    cab = np.asarray(t.column("cab"), dtype=np.int64)
    ca = np.asarray(t.column("ca"), dtype=np.int64)
    cb = np.asarray(t.column("cb"), dtype=np.int64)
    assert cab.max(initial=0) < 9_200_000, "colloc score overflow guard"
    score = cab * COLLOC_SCALE // (ca * cb)
    order = np.lexsort((b, a, -score))[:k]
    return pa.table({
        "a": pa.array(a[order].tolist(), type=pa.string()),
        "b": pa.array(b[order].tolist(), type=pa.string()),
        "cab": pa.array(cab[order]),
        "score": pa.array(score[order]),
    })


# ---------------------------------------------------------------------------
# batched byte-level Levenshtein (edit-distance near-dup verify)
# ---------------------------------------------------------------------------


def levenshtein_batch(a_list, b_list) -> np.ndarray:
    """Exact unit-cost Levenshtein distance for a batch of string pairs,
    vectorized over the pair axis: one python loop over DP rows (max
    byte length), each row a few numpy ops over (npairs, maxlen).
    Byte-level on UTF-8 (matches DuckDB's ``levenshtein``, which counts
    byte edits — verified: levenshtein('héllo','hello') = 2). The
    in-row insertion dependency resolves closed-form for unit costs:
    row[j] = min_{k<=j} (cand[k] + (j-k)) = accmin(cand - j) + j."""
    P = len(a_list)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    ab = [s.encode("utf-8") for s in a_list]
    bb = [s.encode("utf-8") for s in b_list]
    la = np.fromiter((len(x) for x in ab), np.int64, P)
    lb = np.fromiter((len(x) for x in bb), np.int64, P)
    ma, mb = int(la.max()), int(lb.max())
    A = np.zeros((P, ma), dtype=np.uint8)
    B = np.zeros((P, mb), dtype=np.uint8)
    for p, x in enumerate(ab):
        A[p, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    for p, x in enumerate(bb):
        B[p, : len(x)] = np.frombuffer(x, dtype=np.uint8)
    res = np.where(la == 0, lb, 0).astype(np.int64)
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (P, 1))
    jidx = np.arange(mb + 1, dtype=np.int64)
    for i in range(1, ma + 1):
        cost = (A[:, i - 1][:, None] != B).astype(np.int64)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        full = np.concatenate(
            [np.full((P, 1), i, dtype=np.int64), cand - jidx[1:]], axis=1)
        cur = np.minimum.accumulate(full, axis=1) + jidx
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


# ---------------------------------------------------------------------------
# Unigram LM quality scoring (wave 73)
# ---------------------------------------------------------------------------


def _lm_merge_counts(t: pa.Table) -> pa.Table:
    """Per-partition exact token-count merge (post-shuffle)."""
    tok = np.asarray(t.column("tok")).astype(str)
    uk, s = group_sum_per_key(
        np.asarray(t.column("cnt"), dtype=np.int64), tok)
    return pa.table({"tok": pa.array(uk.tolist(), type=pa.string()),
                     "cnt": pa.array(s.astype(np.int64))})


class _LmScoreLocal:
    """Scoring stage: broadcast (sorted vocab, logp) arrays resolved
    once per actor task; per batch, flatten tokens -> searchsorted
    logp lookup -> segment-mean per doc -> per-lang (h_sum, n_docs)
    partial rows."""

    def __init__(self, model_ref):
        import ray

        self.vocab, self.logp, self.oov = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "h_sum": pa.array([], type=pa.float64()),
                          "n_docs": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        toks = tokens_list(batch)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        pos = np.searchsorted(self.vocab, flat)
        pos_c = np.minimum(pos, len(self.vocab) - 1)
        hit = self.vocab[pos_c] == flat
        nll = np.where(hit, -self.logp[pos_c], -self.oov)
        off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        nz = lens > 0
        h = np.zeros(len(lens), dtype=np.float64)
        if nz.any():
            seg = np.add.reduceat(nll, off[:-1][nz])
            h[nz] = seg / lens[nz]
        lang = np.asarray(batch.column("lang")).astype(str)
        ul, inv = np.unique(lang[nz], return_inverse=True)
        if not len(ul):
            return empty
        hs = np.zeros(len(ul), dtype=np.float64)
        np.add.at(hs, inv, h[nz])
        nd = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        return pa.table({"lang": pa.array(ul.tolist(), type=pa.string()),
                         "h_sum": pa.array(hs),
                         "n_docs": pa.array(nd)})


def lm_score(docs_ds, num_partitions: int | None = None) -> pa.Table:
    """Per-language mean unigram cross-entropy (nats) under the
    add-one-smoothed corpus LM — the LM-based quality-scoring stage of
    a training-data pipeline: p(tok) = (cnt + 1) / (N + V), per-doc
    H = mean(-ln p), per-lang mean over non-empty docs.

    Scale shape: per-batch value_counts combiner -> ONE keyed shuffle
    for exact global counts -> counts collected to the driver
    (VOCAB-BOUNDED — this corpus has a tiny closed vocabulary; natural
    text at 100 TB would cap to the top-V tokens + an OOV bucket, the
    same broadcast-small-side pattern as `decontaminate`) -> `ray.put`
    the (vocab, logp) model once -> ONE scoring pass emitting bounded
    per-lang partials folded on the driver."""
    import ray

    model_ref, _, _ = _lm_build_model(docs_ds, num_partitions)
    parts = docs_ds.map_batches(
        _LmScoreLocal, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), fn_constructor_args=(model_ref,),
    ).take_all()
    agg: dict[str, list] = {}
    for r in parts:
        a = agg.setdefault(r["lang"], [0.0, 0])
        a[0] += r["h_sum"]
        a[1] += r["n_docs"]
    langs = sorted(agg)
    return pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "mean_h": pa.array([round(agg[g][0] / agg[g][1], 6)
                            for g in langs]),
        "n_docs": pa.array([agg[g][1] for g in langs],
                           type=pa.int64()),
    })


def _lm_build_model(docs_ds, num_partitions=None):
    """Shared LM-count stage: returns (model_ref, n_tot, v) where the
    ref holds the (sorted vocab, logp, oov) broadcast triple."""
    import math

    import ray

    partials = docs_ds.map_batches(
        _vocab_local, batch_format="pyarrow", zero_copy_batch=True)
    merged = group_apply_tasks(partials, ["tok"], _lm_merge_counts,
                               num_partitions=num_partitions)
    t = pa.concat_tables(
        [r for r in ray.get(merged.to_arrow_refs()) if r.num_rows]
        or [pa.table({"tok": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})]
    )
    vocab = np.asarray(t.column("tok")).astype(str)
    cnt = np.asarray(t.column("cnt"), dtype=np.int64)
    order = np.argsort(vocab)
    vocab, cnt = vocab[order], cnt[order]
    n_tot = int(cnt.sum())
    v = len(vocab)
    denom = float(n_tot + v)
    logp = np.log((cnt + 1.0) / denom) if v else np.empty(0)
    oov = math.log(1.0 / denom) if denom > 0 else 0.0
    return ray.put((vocab, logp, oov)), n_tot, v


class _LmMomentsLocal(_LmScoreLocal):
    """First pass of the outlier census: per-lang (h_sum, h2_sum, n)
    moment partials over per-doc cross-entropies."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "h_sum": pa.array([], type=pa.float64()),
                          "h2_sum": pa.array([], type=pa.float64()),
                          "n_docs": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        lang, h, nz = self._doc_h(batch)
        ul, inv = np.unique(lang[nz], return_inverse=True)
        if not len(ul):
            return empty
        hs = np.zeros(len(ul))
        h2 = np.zeros(len(ul))
        np.add.at(hs, inv, h[nz])
        np.add.at(h2, inv, h[nz] * h[nz])
        nd = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        return pa.table({"lang": pa.array(ul.tolist(), type=pa.string()),
                         "h_sum": pa.array(hs), "h2_sum": pa.array(h2),
                         "n_docs": pa.array(nd)})

    def _doc_h(self, batch: pa.Table):
        toks = tokens_list(batch)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        pos = np.searchsorted(self.vocab, flat)
        pos_c = np.minimum(pos, max(len(self.vocab) - 1, 0))
        hit = (self.vocab[pos_c] == flat) if len(self.vocab) else \
            np.zeros(len(flat), dtype=bool)
        nll = np.where(hit, -self.logp[pos_c] if len(self.vocab)
                       else -self.oov, -self.oov)
        off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        nz = lens > 0
        h = np.zeros(len(lens))
        if nz.any():
            h[nz] = np.add.reduceat(nll, off[:-1][nz]) / lens[nz]
        return np.asarray(batch.column("lang")).astype(str), h, nz


class _LmOutlierLocal(_LmMomentsLocal):
    """Second pass: per-lang count of docs with h > the broadcast
    (mean + 2 sigma) threshold."""

    def __init__(self, model_ref, thr_ref):
        import ray

        super().__init__(model_ref)
        self.thr = ray.get(thr_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "n_out": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        lang, h, nz = self._doc_h(batch)
        thr = np.array([self.thr.get(g, np.inf) for g in lang])
        out = nz & (h > thr)
        ul, cnts = np.unique(lang[out], return_counts=True)
        if not len(ul):
            return empty
        return pa.table({"lang": pa.array(ul.tolist(), type=pa.string()),
                         "n_out": pa.array(cnts.astype(np.int64))})


def lm_outliers(docs_ds, num_partitions: int | None = None) -> pa.Table:
    """Per-language LM-score outlier census: docs whose unigram
    cross-entropy exceeds their language's mean + 2 * population sigma
    — the statistical quality-gate of an LM-scored filtering stage.
    Two broadcast-model passes: (1) per-lang (sum, sumsq, n) moment
    partials -> driver thresholds (bounded: one row per language);
    (2) per-lang outlier counts against the broadcast thresholds."""
    import math

    import ray

    model_ref, _, _ = _lm_build_model(docs_ds, num_partitions)
    parts = docs_ds.map_batches(
        _LmMomentsLocal, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), fn_constructor_args=(model_ref,),
    ).take_all()
    agg: dict[str, list] = {}
    for r in parts:
        a = agg.setdefault(r["lang"], [0.0, 0.0, 0])
        a[0] += r["h_sum"]
        a[1] += r["h2_sum"]
        a[2] += r["n_docs"]
    thr = {}
    for g, (s, s2, n) in agg.items():
        mean = s / n
        var = max(s2 / n - mean * mean, 0.0)
        thr[g] = mean + 2.0 * math.sqrt(var)
    thr_ref = ray.put(thr)
    parts2 = docs_ds.map_batches(
        _LmOutlierLocal, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), fn_constructor_args=(model_ref, thr_ref),
    ).take_all()
    out: dict[str, int] = {g: 0 for g in agg}
    for r in parts2:
        out[r["lang"]] = out.get(r["lang"], 0) + r["n_out"]
    langs = sorted(agg)
    return pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "n_docs": pa.array([agg[g][2] for g in langs], type=pa.int64()),
        "n_out": pa.array([out[g] for g in langs], type=pa.int64()),
    })


class _LmCorrLocal(_LmMomentsLocal):
    """Per-lang joint moment partials of (token count, cross-entropy):
    (sx, sy, sxy, sx2, sy2, n) — the Pearson-correlation feed."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ["lang", "sx", "sy", "sxy", "sx2", "sy2", "n"]
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          **{c: pa.array([], type=pa.float64())
                             for c in cols[1:6]},
                          "n": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        lang, h, nz = self._doc_h(batch)
        toks = tokens_list(batch)
        x = np.asarray(pc.list_value_length(toks),
                       dtype=np.int64).astype(np.float64)
        ul, inv = np.unique(lang[nz], return_inverse=True)
        if not len(ul):
            return empty
        xs, ys = x[nz], h[nz]

        def seg(v):
            o = np.zeros(len(ul))
            np.add.at(o, inv, v)
            return o

        return pa.table({
            "lang": pa.array(ul.tolist(), type=pa.string()),
            "sx": pa.array(seg(xs)), "sy": pa.array(seg(ys)),
            "sxy": pa.array(seg(xs * ys)), "sx2": pa.array(seg(xs * xs)),
            "sy2": pa.array(seg(ys * ys)),
            "n": pa.array(np.bincount(inv, minlength=len(ul))
                          .astype(np.int64)),
        })


def lm_len_corr(docs_ds, num_partitions: int | None = None) -> pa.Table:
    """Per-language Pearson correlation between document token count and
    unigram LM cross-entropy — the length-vs-quality diagnostic of an
    LM-scored corpus. One broadcast-model pass emitting bounded per-lang
    joint-moment partials; r folds on the driver with the textbook
    (n Sxy - Sx Sy) / sqrt((n Sx2 - Sx^2)(n Sy2 - Sy^2)) formula (the
    SQL twin uses the identical expression)."""
    import math

    import ray

    model_ref, _, _ = _lm_build_model(docs_ds, num_partitions)
    parts = docs_ds.map_batches(
        _LmCorrLocal, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), fn_constructor_args=(model_ref,),
    ).take_all()
    agg: dict[str, list] = {}
    for r in parts:
        a = agg.setdefault(r["lang"], [0.0] * 5 + [0])
        for i, k in enumerate(("sx", "sy", "sxy", "sx2", "sy2", "n")):
            a[i] += r[k]
    langs = sorted(agg)
    rs = []
    for g in langs:
        sx, sy, sxy, sx2, sy2, n = agg[g]
        n = float(n)
        den = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
        rs.append(round((n * sxy - sx * sy) / math.sqrt(den), 6)
                  if den > 0 else 0.0)
    return pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "r": pa.array(rs),
        "n_docs": pa.array([int(agg[g][5]) for g in langs],
                           type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (integer-rational variant)
# ---------------------------------------------------------------------------

BM25_SCALE = 1_000  # idf_u = (N * BM25_SCALE) // df
# k1 = 1.2, b = 0.75 folded into one integer-rational per-term factor:
#   tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/S))
#     = (22000 * tf * S) // (10*S*tf + 3*S + 9*dl*N)   [milli-units]
# staying int64-safe (22000 * tf * S < 2^63 while S < ~4e14 tokens).


def _dl_from_tf(t: pa.Table) -> pa.Table:
    """Per-batch exact (doc_id, dl) from the tf table: docs are
    row-atomic, so one doc's (tok, tf) rows all live in one tf block and
    dl = sum(tf) per doc needs no shuffle (and no second corpus scan)."""
    doc = np.asarray(t.column("doc_id"), dtype=np.int64)
    tfv = np.asarray(t.column("tf"), dtype=np.int64)
    uk, inv = np.unique(doc, return_inverse=True)
    return pa.table({
        "doc_id": pa.array(uk),
        "dl": pa.array(ibincount(inv, tfv, minlength=len(uk))),
    })


def bm25_topk(docs_ds, k: int = 15, qk: int = 3):
    """Top-k documents by BM25 against the corpus's own top-`qk`
    document-frequency tokens (ties by token asc) — the classic
    retrieval ranking kept ENTIRELY integer-rational (k1 = 1.2,
    b = 0.75 as exact fractions, floor division at the two defined
    points) so the ranking and the oracle hash are float-free, like
    `tfidf_topk`. Plan: per-batch exact tf + dl (row-atomic docs, no
    shuffle), tok-hash df reduce, bounded top-qk query-token merge,
    broadcast query set probed inside the tf scan, one doc-hash score
    reduce. Returns (doc_id, score_u) with score_u > 0, top-k by
    (score_u DESC, doc_id ASC)."""
    from ..core.shuffle import hash_join_tasks

    n_docs = int(docs_ds.count())
    tf = docs_ds.map_batches(_tf_local, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    df = group_apply_tasks(tf, ["tok"], _df_merge)

    def _qcand(t: pa.Table) -> pa.Table:
        tok = np.asarray(t.column("tok")).astype(str)
        dfv = np.asarray(t.column("df"), dtype=np.int64)
        order = np.lexsort((tok, -dfv))[:qk]
        return pa.table({"tok": pa.array(tok[order], type=pa.string()),
                         "df": pa.array(dfv[order])})

    cands = df.map_batches(_qcand, batch_format="pyarrow").to_pandas()
    order = np.lexsort((cands["tok"].to_numpy().astype(str),
                        -cands["df"].to_numpy()))[:qk]
    qtok = cands["tok"].to_numpy().astype(str)[order]
    qdf = cands["df"].to_numpy()[order].astype(np.int64)
    idf_u = {t: int((n_docs * BM25_SCALE) // d)
             for t, d in zip(qtok, qdf)}

    dl = tf.map_batches(_dl_from_tf, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    s_total = int(sum(r["dl"] for r in
                      dl.map_batches(
                          lambda t: pa.table({"dl": pa.array(
                              [np.asarray(t.column("dl"),
                                          dtype=np.int64).sum()])}),
                          batch_format="pyarrow").take_all()))

    qset = frozenset(qtok)

    def _probe(t: pa.Table, *, _q=qset) -> pa.Table:
        tok = np.asarray(t.column("tok")).astype(str)
        keep = np.isin(tok, np.array(sorted(_q)))
        return pa.table({
            "doc_id": pa.array(np.asarray(t.column("doc_id"),
                                          dtype=np.int64)[keep]),
            "tok": pa.array(tok[keep], type=pa.string()),
            "tf": pa.array(np.asarray(t.column("tf"),
                                      dtype=np.int64)[keep]),
        })

    hits = tf.map_batches(_probe, batch_format="pyarrow",
                          zero_copy_batch=True)

    idf_items = tuple(sorted(idf_u.items()))

    def _score(j: pa.Table, *, _idf=idf_items, _s=s_total,
               _n=n_docs) -> pa.Table:
        tok = np.asarray(j.column("tok")).astype(str)
        tfv = np.asarray(j.column("tf"), dtype=np.int64)
        dlv = np.asarray(j.column("dl"), dtype=np.int64)
        lut = dict(_idf)
        idf = np.array([lut[t] for t in tok], dtype=np.int64)
        r_u = (22_000 * tfv * _s) // (10 * _s * tfv + 3 * _s
                                      + 9 * dlv * _n)
        doc = np.asarray(j.column("doc_id"), dtype=np.int64)
        uk, inv = np.unique(doc, return_inverse=True)
        sc = ibincount(inv, idf * r_u, minlength=len(uk))
        return pa.table({"doc_id": pa.array(uk),
                         "score_u": pa.array(sc)})

    scored = hash_join_tasks(hits, dl, on="doc_id", post=_score)
    rows = scored.to_pandas()
    rows = rows[rows.score_u > 0]
    order = np.lexsort((rows.doc_id.to_numpy(),
                        -rows.score_u.to_numpy()))[:k]
    rows = rows.iloc[order]
    return pa.table({
        "doc_id": pa.array(rows.doc_id.to_numpy(), type=pa.int64()),
        "score_u": pa.array(rows.score_u.to_numpy(), type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer-Wilkerson-Aiken / MOSS)
# ---------------------------------------------------------------------------

WINNOW_K = 3  # k-gram size (tokens)
WINNOW_W = 4  # window size (k-grams)


def winnow_stats(batch: pa.Table, k: int = WINNOW_K,
                 w: int = WINNOW_W) -> pa.Table:
    """Per-document winnowing fingerprint census: hash every token
    k-gram (md5_number_lower of the space-joined gram, mod 2^61 — the
    same SQL-reproducible basis as `fingerprint`), slide a w-window over
    the k-gram hash sequence and select each window's MINIMUM; the
    document's fingerprint is the distinct selected set (the MOSS
    document-similarity fingerprint: any shared substring of length >=
    w + k - 1 tokens is guaranteed to share a selected hash). Documents
    shorter than w k-grams select their global minimum. Fully
    vectorized: one sliding_window_view min over the batch-flat valid
    k-gram array with cross-document windows masked, distinct-per-doc
    via lexsort run-dedup, XOR identity via bitwise reduceat. Output
    (doc_id, n_kgrams, n_fps, fp_xor)."""
    toks = tokens_list(batch)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    nrows = batch.num_rows
    n_kg = np.maximum(lens - (k - 1), 0)
    out_fps = np.zeros(nrows, dtype=np.int64)
    out_xor = np.zeros(nrows, dtype=np.int64)
    if len(flat) >= k:
        # k-gram strings at every flat position (cross-doc ones dropped
        # below by construction of the per-doc position ranges)
        grams = flat[: len(flat) - (k - 1)]
        for i in range(1, k):
            grams = np.char.add(np.char.add(grams, " "),
                                flat[i: len(flat) - (k - 1) + i])
        uniq, inv = np.unique(grams, return_inverse=True)
        hu = np.empty(len(uniq), dtype=np.uint64)
        for i, g in enumerate(uniq):
            hu[i] = md5_lower64(g)
        gh_full = (hu & _FP_MASK).astype(np.int64)[inv]
        # valid grams = positions whose k tokens stay in one document
        dof = np.repeat(np.arange(nrows), lens)
        gsel = np.nonzero(dof[: len(flat) - (k - 1)] == dof[k - 1:])[0]
        gvals = gh_full[gsel]
        gdoc = dof[gsel]
        pairs_doc, pairs_val = [], []
        if len(gvals) >= w:
            from numpy.lib.stride_tricks import sliding_window_view

            wins = sliding_window_view(gvals, w).min(axis=1)
            ok = gdoc[: len(wins)] == gdoc[w - 1:]
            pairs_doc.append(gdoc[: len(wins)][ok])
            pairs_val.append(wins[ok])
        # short docs (0 < ng < w): single window = global min. reduceat
        # over the nonzero docs' offsets gives each such doc's segment
        # min (consecutive starts = consecutive nonzero docs).
        short = (n_kg > 0) & (n_kg < w)
        if short.any():
            goff = np.concatenate(([0], np.cumsum(n_kg)))[:-1]
            nz = n_kg > 0
            seg_min = np.minimum.reduceat(gvals, goff[nz])
            pairs_doc.append(np.nonzero(short)[0])
            pairs_val.append(seg_min[short[nz]])
        if pairs_doc:
            pd_ = np.concatenate(pairs_doc)
            pv = np.concatenate(pairs_val)
            order = np.lexsort((pv, pd_))
            d, v = pd_[order], pv[order]
            new = np.empty(len(d), dtype=bool)
            new[0] = True
            new[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
            dd, vv = d[new], v[new]
            np.add.at(out_fps, dd, 1)
            np.bitwise_xor.at(out_xor, dd, vv)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_kgrams": pa.array(n_kg),
        "n_fps": pa.array(out_fps),
        "fp_xor": pa.array(out_xor),
    })


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries + exact verify)
# ---------------------------------------------------------------------------

HH_K = 64  # counter budget = heavy-hitter threshold denominator


def _mg_truncate(tok: np.ndarray, cnt: np.ndarray, k: int):
    """Misra-Gries reduction of exact (tok, cnt) to <= k counters:
    subtract the (k+1)-th largest count from all, keep positives — the
    array form of the k-counter decrement loop (Misra-Gries '82 /
    mergeable summaries, Agarwal et al. '12)."""
    if len(tok) <= k:
        return tok, cnt
    kth = np.partition(cnt, len(cnt) - (k + 1))[len(cnt) - (k + 1)]
    keep = cnt > kth
    return tok[keep], cnt[keep] - kth


def _mg_batch_kernel(k: int):
    def _f(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        uk, inv = np.unique(flat, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        t2, c2 = _mg_truncate(uk, cnt, k)
        return pa.table({
            "tok": pa.array(np.concatenate((t2, ["\x00"])),
                            type=pa.string()),
            "cnt": pa.array(np.concatenate((c2, [len(flat)]))),
            "is_total": pa.array([False] * len(t2) + [True]),
        })

    return _f


def heavy_hitters(docs_ds, k: int = HH_K):
    """Exact tokens with global count > m/k (m = total corpus tokens)
    via the Misra-Gries mergeable-summary prefilter: <= k-counter
    summaries per batch (bounded driver traffic), one array-form MG
    merge, then an exact broadcast-probe recount of the <= k surviving
    candidates — the summary's m/(k+1) error bound guarantees no true
    heavy hitter is lost before the exact verify. Output (tok, cnt)
    with cnt * k > m, token ascending."""
    parts = docs_ds.map_batches(
        _mg_batch_kernel(k), batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    m = int(parts.cnt[parts.is_total].sum())
    rows = parts[~parts.is_total]
    tok = rows.tok.to_numpy().astype(str)
    cnt = rows.cnt.to_numpy().astype(np.int64)
    uk, inv = np.unique(tok, return_inverse=True)
    merged = np.zeros(len(uk), dtype=np.int64)
    np.add.at(merged, inv, cnt)
    cands, _ = _mg_truncate(uk, merged, k)
    cand_set = np.sort(cands)

    def _probe(b: pa.Table, *, _c=cand_set) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        keep = flat[np.isin(flat, _c)]
        uk2, inv2 = np.unique(keep, return_inverse=True)
        return pa.table({
            "tok": pa.array(uk2, type=pa.string()),
            "cnt": pa.array(np.bincount(
                inv2, minlength=len(uk2)).astype(np.int64)),
        })

    ex = docs_ds.map_batches(_probe, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    tok2 = ex.tok.to_numpy().astype(str)
    cnt2 = ex.cnt.to_numpy().astype(np.int64)
    uk3, inv3 = np.unique(tok2, return_inverse=True)
    tot = np.zeros(len(uk3), dtype=np.int64)
    np.add.at(tot, inv3, cnt2)
    hh = tot * k > m
    return pa.table({
        "tok": pa.array(uk3[hh], type=pa.string()),
        "cnt": pa.array(tot[hh]),
    })


# ---------------------------------------------------------------------------
# BPE tokenizer training (merge trace over the token-symbol corpus)
# ---------------------------------------------------------------------------

BPE_ROUNDS = 4
BPE_JOIN = "+"


def _bpe_pair_partial(b: pa.Table) -> pa.Table:
    """Per-batch adjacent-symbol pair counts (overlapping positions, the
    classic BPE counting convention), cross-document pairs masked."""
    toks = tokens_list(b)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = np.asarray(pc.list_flatten(toks)).astype(str)
    if len(flat) < 2:
        return pa.table({"a": pa.array([], type=pa.string()),
                         "b": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.int64())})
    dof = np.repeat(np.arange(b.num_rows), lens)
    same = dof[:-1] == dof[1:]
    keys = np.char.add(np.char.add(flat[:-1][same], "\x1f"),
                       flat[1:][same])
    uk, inv = np.unique(keys, return_inverse=True)
    c = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    sp = np.char.partition(uk, "\x1f")
    return pa.table({"a": pa.array(sp[:, 0], type=pa.string()),
                     "b": pa.array(sp[:, 2], type=pa.string()),
                     "c": pa.array(c)})


def _bpe_apply_fn(x: str, y: str):
    """Batch kernel applying one merge (x, y) -> x+BPE_JOIN+y with the
    greedy left-to-right non-overlapping rule, fully vectorized: match
    runs detected with a maximum.accumulate anchor, alternating
    selection within each run (only x == y can produce runs)."""
    merged = x + BPE_JOIN + y

    def _f(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        if len(flat) < 2:
            return b
        dof = np.repeat(np.arange(b.num_rows), lens)
        m = np.concatenate((
            (flat[:-1] == x) & (flat[1:] == y) & (dof[:-1] == dof[1:]),
            [False]))
        idx = np.arange(len(m))
        run_start = m & ~np.concatenate(([False], m[:-1]))
        anchor = np.maximum.accumulate(np.where(run_start, idx, -1))
        sel = m & ((idx - anchor) % 2 == 0)
        sel_idx = np.nonzero(sel)[0]
        out = flat.astype(object)
        out[sel_idx] = merged
        keep = np.ones(len(flat), dtype=bool)
        keep[sel_idx + 1] = False
        new_lens = lens - np.bincount(dof[sel_idx],
                                      minlength=b.num_rows)
        offs = np.concatenate(([0], np.cumsum(new_lens)))
        la = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(out[keep].astype(str), type=pa.string()))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.binary_join(la, " "),
        })

    return _f


def bpe_train(docs_ds, rounds: int = BPE_ROUNDS):
    """Train `rounds` BPE merges over the whitespace-symbol corpus: per
    round, one distributed adjacent-pair count (per-batch partials,
    bounded by the live vocabulary), a driver argmax with the
    deterministic (count DESC, a ASC, b ASC) tie-break, and one
    broadcast vectorized merge pass — the tokenizer-training loop of an
    LLM data pipeline expressed as K scan+apply rounds (no shuffle; the
    pair table IS the reduction). Returns (merge_table, final_ds):
    merge_table rows (round, sym_a, sym_b, pair_count, syms_after)."""
    ds = docs_ds
    rows = []
    for r in range(1, rounds + 1):
        parts = ds.map_batches(_bpe_pair_partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        if len(parts) == 0:
            break
        key = parts.a.astype(str) + "\x1f" + parts.b.astype(str)
        tot = parts.groupby(key, sort=True).c.sum()
        order = np.lexsort((tot.index.to_numpy().astype(str),
                            -tot.to_numpy()))
        best = tot.index[order[0]]
        cnt = int(tot.iloc[order[0]])
        xa, xb = best.split("\x1f")
        ds = ds.map_batches(_bpe_apply_fn(xa, xb),
                            batch_format="pyarrow").materialize()
        n_after = int(sum(
            r2["n"] for r2 in ds.map_batches(
                lambda t: pa.table({"n": pa.array([int(np.asarray(
                    pc.list_value_length(tokens_list(t)),
                    dtype=np.int64).sum())])}),
                batch_format="pyarrow").take_all()))
        rows.append((r, xa, xb, cnt, n_after))
    merge_table = pa.table({
        "round": pa.array([r[0] for r in rows], type=pa.int64()),
        "sym_a": pa.array([r[1] for r in rows], type=pa.string()),
        "sym_b": pa.array([r[2] for r in rows], type=pa.string()),
        "pair_count": pa.array([r[3] for r in rows], type=pa.int64()),
        "syms_after": pa.array([r[4] for r in rows], type=pa.int64()),
    })
    return merge_table, ds
