"""Per-iteration vertex-state checkpointing with per-partition lineage.

Generic form of the north rule's "checkpointed per-partition lineage for
resumable iterations": every k iterations, each state chunk is written as
its own .npz (parallel remote tasks) plus a JSON manifest
``(iteration, chunk, path, sha)``; resume scans manifests newest-first and
restores the first complete, hash-valid snapshot into the object store.
Writes are tmp+rename (commit-then-rename idempotence).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

import ray


@ray.remote(num_cpus=0)
def _save_chunk(path: str, arr: np.ndarray) -> str:
    tmp = path + ".tmp.npz"
    np.savez(tmp, a=arr)
    os.replace(tmp, path)
    return hashlib.sha256(arr.tobytes()).hexdigest()[:16]


def save_state(ckpt_dir: str, tag: str, iteration: int, chunk_refs: list) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    paths = [
        os.path.join(ckpt_dir, f"{tag}_iter{iteration:05d}_chunk{i:03d}.npz")
        for i in range(len(chunk_refs))
    ]
    shas = ray.get([_save_chunk.remote(p, c) for p, c in zip(paths, chunk_refs)])
    man = {
        "tag": tag,
        "iteration": iteration,
        "chunks": [
            {"chunk": i, "path": p, "sha": s}
            for i, (p, s) in enumerate(zip(paths, shas))
        ],
    }
    # shape fingerprint so a stale dir from a differently-configured run
    # (other n or g) can't silently restore wrong-shaped state
    man["num_chunks"] = len(chunk_refs)
    tmp = os.path.join(ckpt_dir, f"{tag}_iter{iteration:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(ckpt_dir, f"{tag}_iter{iteration:05d}.json"))


def load_latest(ckpt_dir: str, tag: str, expected_sizes: list[int] | None = None):
    """-> (iteration, [chunk ObjectRefs]) or (0, None).

    ``expected_sizes`` (the caller engine's per-chunk lengths) guards
    against restoring a sha-valid snapshot written by a run with a
    different n/g: a snapshot whose chunk count or any chunk length
    disagrees is skipped like a corrupt one."""
    if not os.path.isdir(ckpt_dir):
        return 0, None
    manifests = sorted(
        f
        for f in os.listdir(ckpt_dir)
        if f.startswith(f"{tag}_iter") and f.endswith(".json")
    )
    for mf in reversed(manifests):
        try:
            with open(os.path.join(ckpt_dir, mf)) as f:
                man = json.load(f)
            if expected_sizes is not None and len(man["chunks"]) != len(
                expected_sizes
            ):
                raise ValueError("chunk count mismatch")
            chunks = []
            for i, c in enumerate(man["chunks"]):
                arr = np.load(c["path"])["a"]
                if hashlib.sha256(arr.tobytes()).hexdigest()[:16] != c["sha"]:
                    raise ValueError("chunk sha mismatch")
                if expected_sizes is not None and len(arr) != expected_sizes[i]:
                    raise ValueError("chunk length mismatch")
                chunks.append(ray.put(arr))
            return man["iteration"], chunks
        except Exception:  # noqa: BLE001 — fall back to the previous snapshot
            continue
    return 0, None
