"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing — schemas, small batch sizes for wide binary
rows, actor signatures, output layouts — is real and tested. The
codec boundary is explicit: this container ships no image/audio
libraries, so ``decode_payload`` implements a deterministic fake codec
(documented header format) and ``decode_with_library`` raises
``NotImplementedError`` with the integration point spelled out. Swap
the codec, keep the pipeline.

Scale notes: binary payloads are wide — stages default to
``batch_size=64`` so batch × concurrency stays within worker heaps;
payload columns are dropped as soon as features are extracted (same
rule as the html column in extract_text).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # "image" | "audio" | "video"
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),  # images/video; 0 otherwise
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),  # audio/video; 0 otherwise
    ]
)

_MAGIC = b"FAKEMEDIA1"


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media derived from an id column (use the
    embeddings table's ``vec_id`` as the id source). Payload = magic +
    metadata header + blake2b-seeded bytes."""
    ids = batch[batch.column_names[0]].to_pylist()
    kinds, mimes, payloads, widths, heights, durs = [], [], [], [], [], []
    for i in ids:
        i = int(i)
        kind = ("image", "audio", "video")[i % 3]
        w = 32 + (i % 8) * 16 if kind != "audio" else 0
        h = 32 + (i % 5) * 16 if kind != "audio" else 0
        d = (500 + i % 4000) if kind != "image" else 0
        seed = hashlib.blake2b(f"media-{i}".encode(), digest_size=8).digest()
        body = (seed * 64)[: 256 + i % 128]
        header = _MAGIC + np.array([i, w, h, d], dtype=np.int32).tobytes()
        kinds.append(kind)
        mimes.append({"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind])
        payloads.append(header + body)
        widths.append(w)
        heights.append(h)
        durs.append(d)
    return pa.Table.from_pydict(
        {
            "media_id": pa.array([int(i) for i in ids], pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media(ids_ds):
    """Dataset with an integer first column → media Dataset."""
    return ids_ds.map_batches(synth_media_batch, batch_format="pyarrow", batch_size=256)


def decode_payload(payload: bytes) -> np.ndarray:
    """Deterministic fake codec: validates the header, expands the
    body bytes into a (h, w) uint8 'pixel' array (images/video frames)
    or a 1-D 'sample' array (audio)."""
    if not payload.startswith(_MAGIC):
        raise ValueError("bad media payload (missing magic)")
    meta = np.frombuffer(payload[len(_MAGIC) : len(_MAGIC) + 16], dtype=np.int32)
    _, w, h, dur = (int(x) for x in meta)
    body = np.frombuffer(payload[len(_MAGIC) + 16 :], dtype=np.uint8)
    if w and h:
        reps = int(np.ceil(w * h / max(1, len(body))))
        return np.tile(body, reps)[: w * h].reshape(h, w)
    n = max(1, dur * 8)  # 8 fake samples / ms
    reps = int(np.ceil(n / max(1, len(body))))
    return np.tile(body, reps)[:n]


def decode_with_library(payload: bytes, mime: str) -> np.ndarray:
    """Integration point for a real codec (PIL / torchaudio / pyav).

    Not available in this container — raise with the contract: must
    return uint8 ndarray (h, w[, c]) for images / frames, 1-D samples
    for audio.
    """
    raise NotImplementedError(
        "real codecs are not installed in this environment; "
        "plug PIL.Image.open / soundfile.read / av decode here"
    )


class MediaDecoder:
    """Actor stage: decode + per-item feature extraction.

    Emits metadata + small numeric features, DROPS the payload column.
    ``resize_to``: images/frames are average-pooled (real numpy, not a
    stub) to at most (resize_to, resize_to) before feature extraction.
    """

    def __init__(self, resize_to: int = 16, frame_samples: int = 4):
        self.resize_to = resize_to
        self.frame_samples = frame_samples

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape
        fh, fw = max(1, h // self.resize_to), max(1, w // self.resize_to)
        th, tw = h // fh * fh, w // fw * fw
        pooled = arr[:th, :tw].reshape(th // fh, fh, tw // fw, fw).mean(axis=(1, 3))
        return pooled

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch["media_id"].to_pylist(), batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        mean_v, std_v, n_frames, feat_dim = [], [], [], []
        for i, kind, p in zip(ids, kinds, payloads):
            arr = decode_payload(p)
            if kind == "video":
                # deterministic frame sampling: reuse the decoded frame
                # shifted per sampled frame index
                frames = [np.roll(arr, f) for f in range(self.frame_samples)]
                arrs = [self._resize(f) for f in frames]
                flat = np.concatenate([a.ravel() for a in arrs])
                n_frames.append(self.frame_samples)
            elif kind == "image":
                a = self._resize(arr)
                flat = a.ravel()
                n_frames.append(1)
            else:  # audio
                flat = arr.astype(np.float64)
                n_frames.append(0)
            mean_v.append(float(np.round(flat.mean(), 4)))
            std_v.append(float(np.round(flat.std(), 4)))
            feat_dim.append(len(flat))
        out = batch.drop_columns(["payload"])
        out = out.append_column("mean_val", pa.array(mean_v, pa.float64()))
        out = out.append_column("std_val", pa.array(std_v, pa.float64()))
        out = out.append_column("n_frames", pa.array(n_frames, pa.int32()))
        return out.append_column("feat_dim", pa.array(feat_dim, pa.int64()))


def media_features(media_ds, *, concurrency: int | tuple[int, int] = 4, batch_size: int = 64):
    """media Dataset → per-item features (payload dropped). Actor pool:
    a real codec would hold decoder state / hardware handles."""
    from rdf2smw_ray.util import pool

    return media_ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )
