"""Multimodal part 6: dHash perceptual dedup over the real BMP codec."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.multimodal6 import (
    DHASH_BITS,
    IMAGE_DHASH_GROUPS_SQL,
    IMAGE_DHASH_HAMMING_SQL,
    image_dhash_groups,
    image_dhash_hamming_curve,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (image_dhash_groups, IMAGE_DHASH_GROUPS_SQL),
        (image_dhash_hamming_curve, IMAGE_DHASH_HAMMING_SQL),
    ],
    ids=["groups", "hamming"],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


def test_dhash_in_range_and_groups_partition_corpus(spark, sf_dir):
    rows = image_dhash_groups(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["dhash_q"] < (1 << DHASH_BITS)


def test_hamming_curve_counts_all_consecutive_pairs(spark, sf_dir):
    rows = image_dhash_hamming_curve(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_pairs"] for r in rows) == n_docs - 1
    for r in rows:
        assert 0 <= r["hamming"] <= DHASH_BITS


def test_dhash_hand_computed_single_image(spark):
    """doc_id 0: gray(x,y) from the pixel formula; verify the packed
    bits against a direct Python recomputation."""
    from oracledb_datapump_spark.operators.multimodal2 import (
        BMP_H,
        BMP_W,
        _bmp_pixel,
    )
    from oracledb_datapump_spark.operators.multimodal6 import (
        LUMA_B,
        LUMA_G,
        LUMA_R,
        _dhash_frame,
    )

    want = 0
    for y in range(BMP_H):
        for x in range(BMP_W - 1):
            r1, g1, b1 = _bmp_pixel(0, x, y)
            r2, g2, b2 = _bmp_pixel(0, x + 1, y)
            g_a = (LUMA_R * r1 + LUMA_G * g1 + LUMA_B * b1) // 1000
            g_b = (LUMA_R * r2 + LUMA_G * g2 + LUMA_B * b2) // 1000
            if g_b > g_a:
                want |= 1 << (y * (BMP_W - 1) + x)
    # build a one-doc corpus through the real codec path
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.range(1).selectExpr(
            "id AS doc_id", "'x' AS text", "'en' AS lang",
            "'s' AS source", "CAST(1 AS LONG) AS n_chars"
        ).write.parquet(f"{td}/documents.parquet")
        got = _dhash_frame(spark, td).collect()[0]["dhash_q"]
    assert got == want
