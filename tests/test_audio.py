"""Audio decode path (multimodal/binary.py): real stdlib-wave PCM decode,
stand-in fallback, and the Arrow-batched extract_audio_features plumbing."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from scraper_db_refine_merge_spark.multimodal.binary import (
    FEATURE_DIM,
    decode_audio,
    extract_audio_features,
    real_audio_features,
)


def _wav_bytes(freq_hz: float, seconds: float, rate: int = 8000, nch: int = 1, amp: float = 0.5) -> bytes:
    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            s = int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / rate))
            frames += struct.pack("<h", s) * nch
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_audio_wav_roundtrip():
    blob = _wav_bytes(440.0, 0.25, rate=8000)
    sr, nch, nf, samples = decode_audio(blob)
    assert (sr, nch, nf) == (8000, 1, 2000)
    assert len(samples) == 2000
    assert max(samples) == pytest.approx(0.5, abs=0.01)


def test_decode_audio_stereo_mono_mix():
    blob = _wav_bytes(440.0, 0.1, rate=8000, nch=2)
    sr, nch, nf, samples = decode_audio(blob)
    assert (nch, nf, len(samples)) == (2, 800, 800)


def test_decode_audio_rejects_non_wav():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfbnot-a-wav-mp3-frame" * 10)


def test_real_audio_features_envelope():
    # constant-amplitude sine → near-flat RMS envelope around amp/sqrt(2)
    blob = _wav_bytes(440.0, 0.5, rate=8000, amp=0.5)
    sr, nch, dur, feats = real_audio_features(blob)
    assert (sr, nch) == (8000, 1)
    assert dur == 500
    assert len(feats) == FEATURE_DIM
    expected = 0.5 / math.sqrt(2) * 2 - 1
    assert all(abs(f - expected) < 0.05 for f in feats)
    assert real_audio_features(blob) == real_audio_features(blob)  # deterministic


def test_extract_audio_features_modes(spark):
    wav = _wav_bytes(220.0, 0.2)
    rows = [
        ("a1", "audio", wav),
        ("a2", "audio", b"compressed-blob-no-decoder"),
        ("v1", "video", wav),  # wrong type → filtered out
    ]
    media = spark.createDataFrame(rows, "media_id string, media_type string, content binary")

    by_id = {r["media_id"]: r for r in extract_audio_features(media, "auto").collect()}
    assert set(by_id) == {"a1", "a2"}
    assert by_id["a1"]["sample_rate"] == 8000 and by_id["a1"]["duration_ms"] == 200
    assert by_id["a2"]["sample_rate"] is None  # stand-in fallback
    assert len(by_id["a1"]["features"]) == FEATURE_DIM == len(by_id["a2"]["features"])

    stand_in = {r["media_id"]: r for r in extract_audio_features(media, "never").collect()}
    assert all(r["sample_rate"] is None for r in stand_in.values())
    assert stand_in["a1"]["content_hash"] == by_id["a1"]["content_hash"]

    with pytest.raises(Exception, match="NotImplementedError|PythonException"):
        extract_audio_features(media, "always").collect()


def test_q66_runs_at_smoke_sf(spark, sf_dir):
    from scraper_db_refine_merge_spark.plans.multimodalq import q66_audio_features

    out = q66_audio_features(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["feat_dim"] == FEATURE_DIM for r in rows)
