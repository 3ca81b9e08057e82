"""Batch 54: streaming bottom-k (KMV) sketch + the ORC x CHECKSUM
integrity composition."""

import duckdb

from oracledb_datapump_spark.operators import etl as E
from oracledb_datapump_spark.streaming import kmv


def test_kmv_state_is_order_independent(spark):
    """The two-micro-batch streaming state must equal the batch SQL
    bottom-k exactly — bottom-k is order-independent, so any deviation
    is a state-merge bug."""
    sf = "/root/testdata/sf0.001"
    [row] = kmv.streaming_bottomk_distinct(spark, sf).collect()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    [want] = con.sql(kmv.STREAMING_BOTTOMK_DISTINCT_SQL).fetchall()
    assert tuple(row) == want
    # sanity on the estimator: k <= KMV_K, estimate within the trivial
    # bounds for a uniform 60-bit hash family
    assert row.k <= kmv.KMV_K
    assert row.kth_hash > 0
    assert row.est_distinct >= row.k - 1


def test_orc_checksum_roundtrip_and_tamper(spark):
    """ORC dump under CHECKSUM: verified import completes with exact
    nation rows; a flipped byte in one ORC part is rejected."""
    sf = "/root/testdata/sf0.001"
    rows = E.datapump_roundtrip_orc_checksum(spark, sf).collect()
    assert len(rows) == 25
    assert all(r.verified_import and r.tamper_rejected for r in rows)
