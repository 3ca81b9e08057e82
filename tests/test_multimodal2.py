"""Real-codec multimodal tests: container validity, corruption
negative-proofs, and padding sensitivity."""

import io
import struct
import wave

import pytest

from oracledb_datapump_spark.operators.multimodal2 import (
    BMP_H,
    BMP_W,
    WAV_RATE,
    _bmp_bytes,
    _bmp_pixel,
    _wav_bytes,
    _wav_samples,
    audio_decode_features,
    image_decode_features,
)


def test_wav_payload_is_a_valid_riff_file():
    raw = _wav_bytes(7)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    with wave.open(io.BytesIO(raw), "rb") as w:
        assert w.getframerate() == WAV_RATE
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == len(_wav_samples(7))


def test_wav_decode_rejects_corruption():
    raw = bytearray(_wav_bytes(3))
    raw[8:12] = b"XXXX"  # break the WAVE form type
    with pytest.raises(Exception):
        wave.open(io.BytesIO(bytes(raw)), "rb")


def test_bmp_payload_layout_and_padding():
    raw = _bmp_bytes(11)
    assert raw[:2] == b"BM"
    (w, h) = struct.unpack("<ii", raw[18:26])
    assert (w, h) == (BMP_W, BMP_H)
    stride = BMP_W * 3 + (4 - (BMP_W * 3) % 4) % 4
    assert stride != BMP_W * 3, "fixture must exercise row padding"
    assert len(raw) == 54 + stride * BMP_H
    # first stored row is the BOTTOM image row; BGR order
    b, g, r = raw[54], raw[55], raw[56]
    assert (r, g, b) == _bmp_pixel(11, 0, BMP_H - 1)
    # pad bytes are zero
    assert raw[54 + BMP_W * 3 : 54 + stride] == b"\x00" * (stride - BMP_W * 3)


def test_decoders_match_formula(spark, sf_dir):
    import math

    rows = audio_decode_features(spark, sf_dir).collect()
    for r in rows[:20]:
        s = _wav_samples(r.doc_id)
        assert r.n_samples == len(s)
        assert r.peak_amp == max(abs(v) for v in s)
        assert r.rms_amp == int(
            math.floor(math.sqrt(sum(v * v for v in s) // len(s)))
        )
    rows = image_decode_features(spark, sf_dir).collect()
    for r in rows[:20]:
        px = [
            _bmp_pixel(r.doc_id, x, y)
            for x in range(BMP_W)
            for y in range(BMP_H)
        ]
        n = BMP_W * BMP_H
        assert r.mean_r == sum(p[0] for p in px) // n
        assert r.mean_g == sum(p[1] for p in px) // n
        assert r.mean_b == sum(p[2] for p in px) // n


def test_forgetting_bmp_padding_breaks_decode():
    """A parser that assumes stride == 3·width reads pad bytes as pixels
    — with width {BMP_W} the means shift. Pins that the gate actually
    guards the padding logic."""
    raw = _bmp_bytes(42)
    off = 54
    w, h = BMP_W, BMP_H
    naive = []
    correct = []
    stride = w * 3 + (4 - (w * 3) % 4) % 4
    for y in range(h):
        for x in range(w):
            naive_base = off + (h - 1 - y) * (w * 3) + 3 * x
            good_base = off + (h - 1 - y) * stride + 3 * x
            naive.append(raw[naive_base + 2])
            correct.append(raw[good_base + 2])
    assert naive != correct, "padding made no difference — weak fixture"
    n = w * h
    assert sum(correct) // n == sum(
        _bmp_pixel(42, x, y)[0] for x in range(w) for y in range(h)
    ) // n
