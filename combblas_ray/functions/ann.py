"""Similarity search over an embedding column (list<float>).

- ``ann_bruteforce_topk``: exact cosine top-k. The query matrix is
  broadcast once (``ray.put``); each map_batches task computes its shard's
  similarities with one float64 matmul and emits a PER-SHARD top-k; the
  driver merges tiny partials. This is the scalable sharded-scan baseline.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing (deterministic seed) —
  candidates restricted to matching buckets (multi-probe over bands),
  re-ranked exactly. Scale path for when the shard scan is too slow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id"))
    emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, emb


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


def ann_bruteforce_topk(emb_ds, query_ids: np.ndarray, k: int = 5):
    """(query_id, neighbor_id, rnk) — exact cosine top-k per query,
    self excluded; ties broken by neighbor id ascending."""
    import ray

    q_rows = emb_ds.filter(
        expr=f"vec_id < {int(np.max(query_ids) + 1)}"
    ).take_all()
    q_rows = [r for r in q_rows if r["vec_id"] in set(query_ids.tolist())]
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = _normalize(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    q_ref = ray.put((q_ids, Q))

    def _partial(batch: pa.Table, *, _ref=q_ref) -> pa.Table:
        q_ids, Q = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, emb = _to_matrix(batch)
        sims = Q @ _normalize(emb).T  # (nq, shard)
        qs, ns, ss = [], [], []
        kk = min(k + 1, sims.shape[1])
        for qi in range(len(q_ids)):
            row = sims[qi]
            part = np.argpartition(-row, kk - 1)[:kk]
            qs.extend([q_ids[qi]] * len(part))
            ns.extend(ids[part].tolist())
            ss.extend(row[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, type=pa.int64()),
                "neighbor_id": pa.array(ns, type=pa.int64()),
                "sim": pa.array(ss, type=pa.float64()),
            }
        )

    parts = emb_ds.map_batches(_partial, batch_format="pyarrow").take_all()
    return _merge_topk(parts, k)


def _merge_topk(part_rows: list[dict], k: int) -> pa.Table:
    import collections

    per_q = collections.defaultdict(list)
    for r in part_rows:
        if r["query_id"] != r["neighbor_id"]:
            per_q[r["query_id"]].append((r["neighbor_id"], r["sim"]))
    q_out, n_out, r_out = [], [], []
    for q in sorted(per_q):
        cands = sorted(per_q[q], key=lambda t: (-t[1], t[0]))
        seen = set()
        rnk = 0
        for nid, _s in cands:
            if nid in seen:
                continue
            seen.add(nid)
            rnk += 1
            q_out.append(q)
            n_out.append(nid)
            r_out.append(rnk)
            if rnk >= k:
                break
    return pa.table(
        {
            "query_id": pa.array(q_out, type=pa.int64()),
            "neighbor_id": pa.array(n_out, type=pa.int64()),
            "rnk": pa.array(r_out, type=pa.int64()),
        }
    )


def lsh_planes(dim: int, nbits: int = 16, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(nbits, dim)


def ann_lsh_topk(emb_ds, query_ids: np.ndarray, k: int = 5, nbits: int = 6,
                 probe_bits: int = 2):
    """Bucketed variant: sign-LSH code per vector; candidates = vectors in
    the query's bucket or any bucket within `probe_bits` bit flips
    (multi-probe). Exact re-rank on candidates."""
    import itertools

    import ray

    rows = emb_ds.take_all()  # index-build side; at scale this is sharded
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    planes = lsh_planes(M.shape[1], nbits)
    codes = (M @ planes.T > 0).astype(np.int64)
    code_vals = (codes * (1 << np.arange(nbits))).sum(axis=1)
    qsel = np.isin(ids, query_ids)
    out_parts = []
    buckets: dict[int, np.ndarray] = {}
    for cv in np.unique(code_vals):
        buckets[int(cv)] = np.nonzero(code_vals == cv)[0]
    flips = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_bits + 1)
        for combo in itertools.combinations(range(nbits), r)
    ]
    for qpos in np.nonzero(qsel)[0]:
        qid = ids[qpos]
        cand = []
        for f in flips:
            cv = int(code_vals[qpos]) ^ f
            if cv in buckets:
                cand.append(buckets[cv])
        cand = np.unique(np.concatenate(cand))
        sims = M[cand] @ M[qpos]
        order = np.lexsort((cand, -sims))
        rnk = 0
        for pos in order:
            nid = int(ids[cand[pos]])
            if nid == qid:
                continue
            rnk += 1
            out_parts.append((int(qid), nid, rnk))
            if rnk >= k:
                break
    return pa.table(
        {
            "query_id": pa.array([p[0] for p in out_parts], type=pa.int64()),
            "neighbor_id": pa.array([p[1] for p in out_parts], type=pa.int64()),
            "rnk": pa.array([p[2] for p in out_parts], type=pa.int64()),
        }
    )
