"""Multimodal plumbing tests: schema, decode determinism, resize /
frame-sample math, actor stage end-to-end, codec stub contract."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.multimodal import (
    MEDIA_SCHEMA,
    MediaDecoder,
    decode_payload,
    decode_with_library,
    media_features,
    synth_media,
    synth_media_batch,
)


def _ids(n=30):
    return pa.table({"vec_id": list(range(n))})


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
        a1 = decode_payload(r["payload"])
        a2 = decode_payload(r["payload"])
        assert np.array_equal(a1, a2)
        if r["kind"] != "audio":
            assert a1.shape == (r["height"], r["width"])
        else:
            assert a1.ndim == 1 and len(a1) == r["duration_ms"] * 8


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        decode_payload(b"not a payload")


def test_codec_stub_contract():
    with pytest.raises(NotImplementedError, match="codecs"):
        decode_with_library(b"x", "image/png")


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
