"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns with
metadata columns alongside. Real codec decode is STUBBED (the container has
no image/audio libraries — see ``decode_image_real``); the Ray-side
plumbing is real and tested: schema, stateful actor-pool decode stage
(setup once per actor in ``__init__``), small batch sizes for large
payloads, and typed feature output.

For tests/benchmarks, ``synth_blob_dataset`` generates deterministic fake
"images": a 12-byte header (kind, width, height) + width*height bytes of
arithmetic pixel data.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

HEADER = struct.Struct("<III")  # kind, width, height


def make_blob(item_id: int) -> bytes:
    w = 8 + (item_id % 5) * 4
    h = 8 + (item_id % 3) * 4
    pix = ((np.arange(w * h, dtype=np.int64) * (item_id + 7)) % 251).astype(
        np.uint8
    )
    return HEADER.pack(1, w, h) + pix.tobytes()


def synth_blob_dataset(n: int, *, batch_size: int = 256):
    """Deterministic fake image table (item_id, payload, kind)."""
    import ray

    def _gen(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        return pa.table(
            {
                "item_id": pa.array(ids),
                "payload": pa.array(
                    [make_blob(int(i)) for i in ids], type=pa.binary()
                ),
                "kind": pa.array(["image"] * len(ids), type=pa.string()),
            }
        )

    # small batches: payload rows are heavy; batch x concurrency must fit
    # worker heaps (the knob that matters for real image/audio tables)
    return ray.data.range(n).map_batches(
        _gen, batch_format="numpy", batch_size=batch_size
    )


class DecodeStage:
    """Stateful actor-pool decode stage: pass as a CLASS to
    ``ds.map_batches(DecodeStage, concurrency=N, batch_size=B)``.
    Per-actor setup happens once in __init__ (codec init / model load in
    the real version); __call__ is the per-batch decode."""

    def __init__(self):
        self.header = HEADER  # codec/context initialized once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means = [], [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            kind, w, h = self.header.unpack_from(payload, 0)
            pix = np.frombuffer(payload, dtype=np.uint8, offset=self.header.size)
            ids.append(item_id)
            widths.append(w)
            heights.append(h)
            means.append(float(pix.mean()) if len(pix) else 0.0)
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(widths, type=pa.int64()),
                "height": pa.array(heights, type=pa.int64()),
                "mean_pixel": pa.array(means, type=pa.float64()),
            }
        )


def decode_image_real(payload: bytes):
    """Real-codec decode — requires an image library not present in this
    container. The pipeline shape (DecodeStage actor pool) is identical."""
    raise NotImplementedError(
        "real image decoding needs PIL/opencv; not available in this "
        "environment — use DecodeStage with the deterministic synthetic "
        "format, or swap this function in when the codec library exists"
    )


def decode_pipeline(blob_ds, *, concurrency: int = 2, batch_size: int = 64):
    """blob table -> per-item features via the stateful actor pool."""
    return blob_ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
