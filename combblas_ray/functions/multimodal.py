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


def blob_dataset_from_docs(sf_dir: str, *, kind: str = "image",
                           batch_size: int = 256):
    """Blob table keyed by ``doc_id`` — one payload per corpus document,
    so the multimodal pipelines scale with the same sf as everything
    else. Pure integer synthesis (``make_blob``/``make_video_blob``)
    makes the downstream stats SQL-reproducible (oracle-exact)."""
    import ray

    maker = {"image": make_blob, "video": make_video_blob,
             "audio": make_audio_blob}[kind]

    def _gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table(
            {
                "item_id": pa.array(ids),
                "payload": pa.array(
                    [maker(int(i)) for i in ids], type=pa.binary()
                ),
                "kind": pa.array([kind] * len(ids), type=pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(_gen, batch_format="pyarrow", batch_size=batch_size)


class IntStatsStage:
    """Integer-exact decode statistics — the oracle-checkable sibling of
    ``DecodeStage``: (width, height, px_sum, px_min, px_max) are all
    int64, so a DuckDB twin can regenerate them from the synthesis
    arithmetic. Same actor-pool shape (codec state in ``__init__``,
    per-payload decode loop in ``__call__`` — inherent to opaque
    binary rows)."""

    def __init__(self):
        self.header = HEADER

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, sums, mins, maxs = [], [], [], [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            _, w, h = self.header.unpack_from(payload, 0)
            pix = np.frombuffer(
                payload, dtype=np.uint8, offset=self.header.size
            ).astype(np.int64)
            ids.append(item_id)
            ws.append(w)
            hs.append(h)
            sums.append(int(pix.sum()))
            mins.append(int(pix.min()) if len(pix) else 0)
            maxs.append(int(pix.max()) if len(pix) else 0)
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "px_sum": pa.array(sums, type=pa.int64()),
                "px_min": pa.array(mins, type=pa.int64()),
                "px_max": pa.array(maxs, type=pa.int64()),
            }
        )


class VideoFrameSumStage:
    """Integer-exact frame sampling: every ``stride``-th frame emits one
    row (item_id, frame, f_sum) — ``FrameSampleStage`` with an int64
    pixel sum instead of a float mean, so the sampled-frame table is
    oracle-checkable."""

    def __init__(self, stride: int = 2):
        self.header = HEADER
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, sums = [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            _, nf, fsz = self.header.unpack_from(payload, 0)
            data = np.frombuffer(
                payload, dtype=np.uint8, offset=self.header.size
            ).astype(np.int64)
            frames = data.reshape(nf, fsz)
            fsums = frames.sum(axis=1)
            for j in range(0, nf, self.stride):
                ids.append(item_id)
                fidx.append(j)
                sums.append(int(fsums[j]))
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "frame": pa.array(fidx, type=pa.int64()),
                "f_sum": pa.array(sums, type=pa.int64()),
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


# ---------------------------------------------------------------------------
# audio: (kind=2, sample_rate, n_samples) header + int16 PCM samples
# ---------------------------------------------------------------------------


def make_audio_blob(item_id: int) -> bytes:
    sr = 8000 + (item_id % 3) * 4000
    n = 256 + (item_id % 7) * 64
    t = np.arange(n, dtype=np.float64)
    wave = (np.sin(t * (0.01 + (item_id % 11) * 0.005)) * 12000).astype(
        np.int16
    )
    return HEADER.pack(2, sr, n) + wave.tobytes()


def synth_audio_dataset(n: int, *, batch_size: int = 256):
    import ray

    def _gen(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        return pa.table(
            {
                "item_id": pa.array(ids),
                "payload": pa.array(
                    [make_audio_blob(int(i)) for i in ids], type=pa.binary()
                ),
                "kind": pa.array(["audio"] * len(ids), type=pa.string()),
            }
        )

    return ray.data.range(n).map_batches(
        _gen, batch_format="numpy", batch_size=batch_size
    )


class AudioFeatureStage:
    """Actor-pool audio feature extraction (real DSP on the raw PCM — no
    codec needed once payloads are PCM): duration, RMS energy,
    zero-crossing rate. Per-actor setup in __init__, as a real
    model/codec would be."""

    def __init__(self):
        self.header = HEADER

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rmss, zcrs = [], [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            kind, sr, n = self.header.unpack_from(payload, 0)
            pcm = np.frombuffer(payload, dtype=np.int16,
                                offset=self.header.size).astype(np.float64)
            ids.append(item_id)
            durs.append(n / sr if sr else 0.0)
            rmss.append(float(np.sqrt(np.mean(pcm * pcm))) if n else 0.0)
            zcrs.append(
                float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                if n > 1 else 0.0
            )
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "duration_sec": pa.array(np.round(durs, 6)),
                "rms": pa.array(np.round(rmss, 6)),
                "zcr": pa.array(np.round(zcrs, 6)),
            }
        )


def decode_audio_real(payload: bytes):
    """Real-codec audio decode (mp3/flac/...) — library not in this
    container; the AudioFeatureStage pipeline shape is identical."""
    raise NotImplementedError(
        "compressed-audio decoding needs soundfile/ffmpeg; not available "
        "here — swap this in when the codec exists; features run on PCM"
    )


# ---------------------------------------------------------------------------
# video: (kind=3, n_frames, w*h) header + n_frames grayscale frames
# ---------------------------------------------------------------------------


def make_video_blob(item_id: int, w: int = 8, h: int = 8) -> bytes:
    nf = 4 + (item_id % 5)
    frames = (
        (np.arange(nf * w * h, dtype=np.int64) * (item_id + 3)) % 241
    ).astype(np.uint8)
    return HEADER.pack(3, nf, w * h) + frames.tobytes()


def synth_video_dataset(n: int, *, batch_size: int = 128):
    import ray

    def _gen(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        return pa.table(
            {
                "item_id": pa.array(ids),
                "payload": pa.array(
                    [make_video_blob(int(i)) for i in ids], type=pa.binary()
                ),
                "kind": pa.array(["video"] * len(ids), type=pa.string()),
            }
        )

    return ray.data.range(n).map_batches(
        _gen, batch_format="numpy", batch_size=batch_size
    )


class FrameSampleStage:
    """Actor-pool frame sampling: keep every ``stride``-th frame, emit one
    ROW PER SAMPLED FRAME (flat_map shape) with its mean intensity —
    the decode -> sample -> per-frame-feature layout of a video
    pretraining pipeline."""

    def __init__(self, stride: int = 2):
        self.header = HEADER
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, means = [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            kind, nf, fsz = self.header.unpack_from(payload, 0)
            data = np.frombuffer(payload, dtype=np.uint8,
                                 offset=self.header.size)
            frames = data.reshape(nf, fsz)
            for j in range(0, nf, self.stride):
                ids.append(item_id)
                fidx.append(j)
                means.append(float(frames[j].mean()))
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "frame": pa.array(fidx, type=pa.int64()),
                "mean_intensity": pa.array(np.round(means, 6)),
            }
        )


class ResizeStage:
    """REAL image resize on the raw pixel payloads (2x2 mean pooling) —
    no codec involved, so this one is not a stub: payload in, resized
    payload out, same schema (the transform-in-place pattern)."""

    def __init__(self):
        self.header = HEADER

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, outs = [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            kind, w, h = self.header.unpack_from(payload, 0)
            pix = np.frombuffer(payload, dtype=np.uint8,
                                offset=self.header.size)
            img = pix.reshape(h, w)
            h2, w2 = h // 2 * 2, w // 2 * 2
            small = (
                img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2)
                .mean(axis=(1, 3)).astype(np.uint8)
            )
            ids.append(item_id)
            outs.append(
                self.header.pack(1, w2 // 2, h2 // 2) + small.tobytes()
            )
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(outs, type=pa.binary()),
                "kind": pa.array(["image"] * len(ids), type=pa.string()),
            }
        )


def audio_pipeline(blob_ds, *, concurrency: int = 2, batch_size: int = 64):
    return blob_ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def video_pipeline(blob_ds, *, stride: int = 2, concurrency: int = 2,
                   batch_size: int = 32):
    return blob_ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"stride": stride},
    )


def resize_pipeline(blob_ds, *, concurrency: int = 2, batch_size: int = 64):
    return blob_ds.map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# audio: (kind=2, sample_rate, n_samples) header + int16 PCM — integer
# synthesis so the feature stage is SQL-reproducible (oracle-exact), the
# audio sibling of make_blob/IntStatsStage
# ---------------------------------------------------------------------------

AUDIO_SR = 8000
AUDIO_MOD = 4001  # sample i = (i * (id + 11)) % 4001 - 2000, int16-safe


def make_audio_blob(item_id: int) -> bytes:
    n = 256 + (item_id % 4) * 128
    pcm = ((np.arange(n, dtype=np.int64) * (item_id + 11)) % AUDIO_MOD
           - 2000).astype(np.int16)
    return HEADER.pack(2, AUDIO_SR, n) + pcm.tobytes()


class AudioIntStatsStage:
    """Integer-exact audio features — the oracle-checkable sibling of
    ``AudioFeatureStage``: n_samples, |PCM| sum, energy (sum of
    squares) and zero crossings (sign flips of s<0) are all int64.
    Same actor-pool shape: codec/header state once per actor in
    ``__init__``, per-payload decode loop in ``__call__``."""

    def __init__(self):
        self.header = HEADER

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, abss, sqs, zcs = [], [], [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            _, sr, n = self.header.unpack_from(payload, 0)
            pcm = np.frombuffer(payload, dtype=np.int16,
                                offset=self.header.size).astype(np.int64)
            ids.append(item_id)
            ns.append(n)
            abss.append(int(np.abs(pcm).sum()))
            sqs.append(int((pcm * pcm).sum()))
            neg = pcm < 0
            zcs.append(int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0)
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "n_samples": pa.array(ns, type=pa.int64()),
            "abs_sum": pa.array(abss, type=pa.int64()),
            "sq_sum": pa.array(sqs, type=pa.int64()),
            "zc": pa.array(zcs, type=pa.int64()),
        })


class VideoMotionStage:
    """Temporal-difference motion estimate: sum |frame_t - frame_{t-1}|
    over all pixels per item, exact int64 — the scene-change /
    motion-energy feature as an actor-pool stage (codec state in
    ``__init__``, per-payload loop in ``__call__``)."""

    def __init__(self):
        self.header = HEADER

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, motions, nfs = [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            _, nf, fsz = self.header.unpack_from(payload, 0)
            data = np.frombuffer(payload, dtype=np.uint8,
                                 offset=self.header.size).astype(np.int64)
            frames = data.reshape(nf, fsz)
            ids.append(item_id)
            nfs.append(nf)
            motions.append(int(np.abs(np.diff(frames, axis=0)).sum())
                           if nf > 1 else 0)
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "n_frames": pa.array(nfs, type=pa.int64()),
            "motion": pa.array(motions, type=pa.int64()),
        })


class AudioLagCorrStage:
    """Lag-1 autocorrelation sufficient statistics per audio payload:
    n_samples and sum(x_t * x_{t+1}) over the int16 PCM, exact int64
    (|x| < 2001, n <= 640 -> < 2^32 per item) — the periodicity/
    smoothness feature next to `AudioIntStatsStage`'s energy. Same
    actor-pool shape: header state once per actor, vectorized product
    per payload."""

    def __init__(self):
        self.header = HEADER

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, lags = [], [], []
        for item_id, payload in zip(
            batch.column("item_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            _, sr, n = self.header.unpack_from(payload, 0)
            pcm = np.frombuffer(payload, dtype=np.int16,
                                offset=self.header.size).astype(np.int64)
            ids.append(item_id)
            ns.append(n)
            lags.append(int((pcm[:-1] * pcm[1:]).sum()) if n > 1 else 0)
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "n_samples": pa.array(ns, type=pa.int64()),
            "lag1": pa.array(lags, type=pa.int64()),
        })
