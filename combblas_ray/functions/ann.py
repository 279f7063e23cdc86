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


def _sign_codes(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (M @ planes.T > 0).astype(np.int64)
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)


def ann_lsh_topk(emb_ds, query_ids: np.ndarray, k: int = 5, nbits: int = 6,
                 probe_bits: int = 2):
    """Bucketed variant: sign-LSH code per vector; candidates = vectors in
    the query's bucket or any bucket within `probe_bits` bit flips
    (multi-probe). Exact re-rank on candidates.

    Distributed: the (tiny) query side is read once, each query's probed
    bucket set is computed driver-side and broadcast via ``ray.put``; each
    ``map_batches`` task codes its shard, keeps only vectors landing in a
    probed bucket and emits a per-shard top-(k+1) partial per query. The
    driver merges partials of size O(num_queries * k * shards) only — the
    embedding table itself never leaves the cluster."""
    import itertools

    import ray

    q_max = int(np.max(query_ids) + 1)
    q_rows = [r for r in emb_ds.filter(expr=f"vec_id < {q_max}").take_all()
              if r["vec_id"] in set(query_ids.tolist())]
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = _normalize(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    planes = lsh_planes(Q.shape[1], nbits)
    q_codes = _sign_codes(Q, planes)
    flips = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_bits + 1)
        for combo in itertools.combinations(range(nbits), r)
    ]
    # bucket code -> query positions probing it
    probe: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for f in flips:
            probe.setdefault(int(q_codes[qi]) ^ f, []).append(qi)
    bcast = ray.put((q_ids, Q, probe))

    def _partial(batch: pa.Table, *, _ref=bcast) -> pa.Table:
        q_ids, Q, probe = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, emb = _to_matrix(batch)
        M = _normalize(emb)
        codes = _sign_codes(M, planes)
        hit = np.isin(codes, np.fromiter(probe, dtype=np.int64,
                                         count=len(probe)))
        qs, ns, ss = [], [], []
        if hit.any():
            ids_h, M_h, codes_h = ids[hit], M[hit], codes[hit]
            for cv in np.unique(codes_h):
                sel = np.nonzero(codes_h == cv)[0]
                for qi in probe[int(cv)]:
                    sims = M_h[sel] @ Q[qi]
                    kk = min(k + 1, len(sel))
                    part = np.argpartition(-sims, kk - 1)[:kk]
                    qs.extend([q_ids[qi]] * len(part))
                    ns.extend(ids_h[sel[part]].tolist())
                    ss.extend(sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(qs, type=pa.int64()),
                "neighbor_id": pa.array(ns, type=pa.int64()),
                "sim": pa.array(ss, type=pa.float64()),
            }
        )

    parts = emb_ds.map_batches(_partial, batch_format="pyarrow").take_all()
    return _merge_topk(parts, k)
