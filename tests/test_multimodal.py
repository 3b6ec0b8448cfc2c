"""Multimodal plumbing tests: schema, decode determinism, resize /
frame-sample math, actor stage end-to-end, real BMP/WAV codecs and
the remaining compressed-format stub contract."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.multimodal import (
    MEDIA_SCHEMA,
    MediaDecoder,
    decode_bmp,
    decode_payload,
    decode_wav,
    decode_with_library,
    encode_bmp_gray8,
    encode_wav_pcm16,
    media_features,
    synth_media,
    synth_media_batch,
)


def _ids(n=30):
    return pa.table({"vec_id": list(range(n))})


def _decode(row):
    """Route exactly like MediaDecoder: fake codec by magic, real
    codecs otherwise."""
    p = row["payload"]
    if p.startswith(b"FAKEMEDIA1"):
        return decode_payload(p)
    return decode_with_library(p, row["mime"])


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(7)
    for h, w in [(5, 5), (3, 7), (1, 1), (16, 33)]:  # incl. padded rows
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp_gray8(px)), px)


def test_bmp_topdown_rows():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    buf = bytearray(encode_bmp_gray8(px))
    import struct

    # flip the height sign → top-down row order per the BMP spec
    buf[22:26] = struct.pack("<i", -3)
    flipped = decode_bmp(bytes(buf))
    assert np.array_equal(flipped, px[::-1])


def test_wav_roundtrip_exact_and_stereo():
    samples = (np.arange(-500, 500, dtype=np.int16) * 13).astype(np.int16)
    assert np.array_equal(decode_wav(encode_wav_pcm16(samples)), samples)
    # stereo averages to mono
    import io
    import wave

    buf = io.BytesIO()
    stereo = np.stack([samples, samples + 2]).T.reshape(-1)
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(stereo.astype("<i2").tobytes())
    mono = decode_wav(buf.getvalue())
    assert np.array_equal(mono, (samples + 1).astype(np.int16))  # mean of (s, s+2)


def test_synth_schema_and_kinds():
    t = synth_media_batch(_ids(9))
    assert t.schema.equals(MEDIA_SCHEMA)
    kinds = t["kind"].to_pylist()
    assert set(kinds) == {"image", "audio", "video"}
    # audio has no dims, image has no duration
    for r in t.to_pylist():
        if r["kind"] == "audio":
            assert r["width"] == 0 and r["duration_ms"] > 0
        if r["kind"] == "image":
            assert r["width"] > 0 and r["duration_ms"] == 0


def test_decode_deterministic_and_shape():
    t = synth_media_batch(_ids(6)).to_pylist()
    for r in t:
        a1, a2 = _decode(r), _decode(r)
        assert np.array_equal(a1, a2)
        if r["kind"] != "audio":
            assert a1.shape == (r["height"], r["width"])
        else:
            assert a1.ndim == 1 and len(a1) == r["duration_ms"] * 8


def test_real_codecs_used_for_image_and_audio():
    rows = synth_media_batch(_ids(6)).to_pylist()
    by_kind = {r["kind"]: r for r in rows}
    assert by_kind["image"]["mime"] == "image/bmp"
    assert by_kind["image"]["payload"][:2] == b"BM"  # a real BMP file
    assert by_kind["audio"]["mime"] == "audio/wav"
    assert by_kind["audio"]["payload"][:4] == b"RIFF"  # a real WAV file
    assert by_kind["video"]["payload"].startswith(b"FAKEMEDIA1")


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        decode_payload(b"not a payload")


def test_compressed_codec_stub_contract():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_with_library(b"\x89PNG fake", "image/png")


def test_decoder_stage_direct():
    dec = MediaDecoder(resize_to=8, frame_samples=3)
    out = dec(synth_media_batch(_ids(12)))
    assert "payload" not in out.column_names  # dropped immediately
    rows = out.to_pylist()
    for r in rows:
        if r["kind"] == "video":
            assert r["n_frames"] == 3
        elif r["kind"] == "image":
            assert r["n_frames"] == 1
        else:
            assert r["n_frames"] == 0
        assert r["feat_dim"] > 0
        if r["kind"] == "audio":  # PCM16 samples are signed
            assert -32768.0 <= r["mean_val"] <= 32767.0
        else:
            assert 0.0 <= r["mean_val"] <= 255.0


def test_media_pipeline_end_to_end():
    ds = synth_media(rd.from_arrow(_ids(40)))
    feats = media_features(ds, concurrency=2).to_pandas()
    assert len(feats) == 40
    assert set(feats.columns) >= {"media_id", "kind", "mean_val", "std_val", "n_frames", "feat_dim"}
    # deterministic across runs
    feats2 = media_features(synth_media(rd.from_arrow(_ids(40))), concurrency=2).to_pandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
