"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing — schemas, small batch sizes for wide binary
rows, actor signatures, output layouts — is real and tested. The
codec boundary is now REAL for two of the three modalities without any
third-party dependency: images are genuine 8-bit BMP files and audio
is genuine PCM16 WAV, both encoded here and decoded by
``decode_with_library`` (pure numpy/struct BMP parser; stdlib ``wave``
for WAV). Video remains the honest boundary — there is no stdlib
video codec — so video payloads use the deterministic fake codec
(``decode_payload``, documented header format) and
``decode_with_library`` raises ``NotImplementedError`` for compressed
formats (JPEG/PNG/MP3/MP4), with the integration point spelled out.

Scale notes: binary payloads are wide — stages default to
``batch_size=64`` so batch × concurrency stays within worker heaps;
payload columns are dropped as soon as features are extracted (same
rule as the html column in extract_text).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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

_WAV_RATE = 8000  # 8 samples / ms — keeps duration_ms == n_samples / 8


def _seed_bytes(i: int, n: int) -> bytes:
    """Deterministic pseudo-content for media item ``i``."""
    seed = hashlib.blake2b(f"media-{i}".encode(), digest_size=8).digest()
    reps = -(-n // len(seed))
    return (seed * reps)[:n]


def encode_bmp_gray8(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 → a real 8-bit grayscale BMP file (BITMAPINFOHEADER
    + 256-entry grayscale palette, bottom-up rows padded to 4 bytes) —
    openable by any image viewer/library."""
    h, w = pixels.shape
    row = (w + 3) & ~3  # rows padded to a 4-byte boundary
    palette = np.zeros((256, 4), dtype=np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256)
    data_offset = 14 + 40 + 1024
    image_size = row * h
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + image_size, 0, 0, data_offset
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, image_size, 2835, 2835, 256, 0)
    rows = np.zeros((h, row), dtype=np.uint8)
    rows[:, :w] = pixels[::-1]  # bottom-up
    return header + palette.tobytes() + rows.tobytes()


def encode_wav_pcm16(samples: np.ndarray, rate: int = _WAV_RATE) -> bytes:
    """1-D int16 → a real mono PCM16 WAV file (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic media derived from an id column (use the
    embeddings table's ``vec_id`` as the id source). Images are REAL
    8-bit BMP files and audio is REAL PCM16 WAV (both round-trip
    through ``decode_with_library``); video payloads use the fake
    codec's documented header format (no stdlib video codec exists)."""
    ids = batch[batch.column_names[0]].to_pylist()
    kinds, mimes, payloads, widths, heights, durs = [], [], [], [], [], []
    for i in ids:
        i = int(i)
        kind = ("image", "audio", "video")[i % 3]
        w = 32 + (i % 8) * 16 if kind != "audio" else 0
        h = 32 + (i % 5) * 16 if kind != "audio" else 0
        d = (500 + i % 4000) if kind != "image" else 0
        if kind == "image":
            px = np.frombuffer(_seed_bytes(i, w * h), dtype=np.uint8).reshape(h, w)
            payload, mime = encode_bmp_gray8(px), "image/bmp"
        elif kind == "audio":
            n = d * (_WAV_RATE // 1000)
            samples = (
                np.frombuffer(_seed_bytes(i, 2 * n), dtype="<i2").astype(np.int16)
            )
            payload, mime = encode_wav_pcm16(samples), "audio/wav"
        else:  # video: fake codec (documented boundary)
            body = _seed_bytes(i, 256 + i % 128)
            payload = _MAGIC + np.array([i, w, h, d], dtype=np.int32).tobytes() + body
            mime = "video/fake"
        kinds.append(kind)
        mimes.append(mime)
        payloads.append(payload)
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


def decode_bmp(payload: bytes) -> np.ndarray:
    """Real BMP decoder (pure numpy/struct): uncompressed 8-bit
    BITMAPINFOHEADER files, bottom-up or top-down rows, 4-byte row
    padding. Returns (h, w) uint8."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bitcount, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bitcount != 8 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 8-bit BMP supported (got bitcount={bitcount}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row = (w + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=data_offset
    ).reshape(h, row)[:, :w]
    return rows if top_down else rows[::-1]


def decode_wav(payload: bytes) -> np.ndarray:
    """Real WAV decoder (stdlib ``wave``): mono/stereo PCM16 →
    1-D int16 samples (stereo is averaged to mono)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        data = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
        if f.getnchannels() > 1:
            data = (
                data.reshape(-1, f.getnchannels()).mean(axis=1).astype(np.int16)
            )
    return data


def decode_with_library(payload: bytes, mime: str) -> np.ndarray:
    """Real-codec entry point. BMP and WAV decode here with no
    third-party dependency; compressed formats (JPEG/PNG/MP3/MP4)
    remain the documented integration point — plug PIL.Image.open /
    soundfile.read / av decode behind the same contract: uint8 ndarray
    (h, w[, c]) for images / frames, 1-D samples for audio."""
    if mime == "image/bmp" or payload[:2] == b"BM":
        return decode_bmp(payload)
    if mime == "audio/wav" or payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; "
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
        mimes = (
            batch["mime"].to_pylist()
            if "mime" in batch.column_names
            else [""] * len(ids)
        )
        mean_v, std_v, n_frames, feat_dim = [], [], [], []
        for i, kind, p, mime in zip(ids, kinds, payloads, mimes):
            # real codecs (BMP/WAV) first; fake-codec payloads by magic
            arr = (
                decode_payload(p)
                if p.startswith(_MAGIC)
                else decode_with_library(p, mime)
            )
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
