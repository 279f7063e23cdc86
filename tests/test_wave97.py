"""Brute twins for wave 97: BPE tokenizer training, Zipf coverage."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_bpe(seqs, rounds, join="+"):
    """Reference BPE: per round count all adjacent pairs, merge the
    (count DESC, pair ASC) winner greedily left-to-right per doc."""
    trace = []
    for r in range(rounds):
        cnt = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] += 1
        (xa, xb), c = sorted(cnt.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0]
        out = []
        for s in seqs:
            t, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == xa and s[i + 1] == xb:
                    t.append(xa + join + xb)
                    i += 2
                else:
                    t.append(s[i])
                    i += 1
            out.append(t)
        seqs = out
        trace.append((r + 1, xa, xb, c, sum(len(t) for t in seqs)))
    return trace, seqs


def test_bpe_apply_greedy_runs(ray_session):
    """Adversarial x == y runs: 'a a a a a' merges positions 0-1 and
    2-3, leaving the odd tail."""
    from combblas_ray.functions.text import _bpe_apply_fn

    b = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["a a a a a", "b a a b"],
                                   type=pa.string())})
    out = _bpe_apply_fn("a", "a")(b)
    assert out.column("text").to_pylist() == ["a+a a+a a", "b a+a b"]


def test_bpe_merges_vs_brute(ray_session):
    from combblas_ray.functions import text as T
    from combblas_ray.pipelines import queries as q

    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    seqs = [str(t).split(" ") for t in tab.column("text").to_pylist()]
    trace, final = _brute_bpe(seqs, T.BPE_ROUNDS, T.BPE_JOIN)
    got = q.q_bpe_merges(SF).to_pandas().sort_values("round")
    assert [(int(r["round"]), r.sym_a, r.sym_b, int(r.pair_count),
             int(r.syms_after)) for _, r in got.iterrows()] == trace
    # each merge strictly shrinks the corpus
    assert got.syms_after.is_monotonic_decreasing


def test_bpe_doc_stats_vs_brute(ray_session):
    from combblas_ray.functions import text as T
    from combblas_ray.pipelines import queries as q

    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    ids = tab.column("doc_id").to_pylist()
    seqs = [str(t).split(" ") for t in tab.column("text").to_pylist()]
    _trace, final = _brute_bpe(seqs, T.BPE_ROUNDS, T.BPE_JOIN)
    exp = {int(d): (len(s0), len(s1))
           for d, s0, s1 in zip(ids, seqs, final)}
    got = q.q_bpe_doc_stats(SF).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[int(r.doc_id)] == (int(r.n_before), int(r.n_after))


def test_vocab_coverage_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    tab = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    cnt = Counter()
    for t in tab.column("text").to_pylist():
        cnt.update(str(t).split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    cs = np.cumsum([c for _t, c in ranked])
    got = q.q_vocab_coverage(SF).to_pandas().sort_values("j")
    for _, r in got.iterrows():
        j = int(r.j)
        assert int(r.total) == total
        assert int(r.covered) == int(cs[min(j, len(cs)) - 1])
    # coverage is monotone and capped by the total
    assert got.covered.is_monotonic_increasing
    assert (got.covered <= got.total).all()
