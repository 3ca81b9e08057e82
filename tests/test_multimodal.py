"""Multimodal binary-column plumbing: schema, Arrow batch path, stub gating."""

import pytest

from oracledb_datapump_spark.operators import multimodal as M


def test_media_table_schema(spark, sf_dir):
    df = M.media_table(spark, sf_dir)
    assert [f.name for f in df.schema] == ["doc_id", "payload", "media_meta"]
    assert df.schema["payload"].dataType.typeName() == "binary"
    row = df.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_meta.n_bytes == len(row.payload)


def test_extract_features_roundtrip(spark, sf_dir):
    feats = M.media_features(spark, sf_dir)
    rows = feats.limit(5).collect()
    for r in rows:
        hist = [int(v) for v in r.hist_str.split(",")]
        assert len(hist) == M.HIST_BINS
        assert sum(hist) == r.n_bytes  # every byte lands in a bin
        assert len(r.head_digest) == 32


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"abc", strict=True)
    fake = M.decode_image(b"abcdefghijklmnop", strict=False)
    assert len(fake) == 4 and len(fake[0]) == 4
    assert fake == M.decode_image(b"abcdefghijklmnop", strict=False)  # deterministic
