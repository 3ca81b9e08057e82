"""Property tests for the pipeline25 operators and the SAMPLE directive
— independent references formulated differently from both the operator
and its gated oracle."""

import hashlib
from collections import defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.directives import DirectiveBase as D, PlanConfig
from oracledb_datapump_spark.exceptions import UsageError
from oracledb_datapump_spark.operators import pipeline25 as PL25
from oracledb_datapump_spark.operators.etl import SAMPLE_PPM, datapump_roundtrip_sample
from oracledb_datapump_spark.operators.pipeline25 import (
    DAY_US,
    customer_dormancy_bands,
    nation_share_of_region,
    returns_rate_by_brand,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "region", "lineitem", "part"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_sample_directive_validation_and_compose():
    with pytest.raises(UsageError, match="ppm.*column"):
        D.SAMPLE("250000").apply(PlanConfig())
    with pytest.raises(UsageError, match="integer"):
        D.SAMPLE("abc:o_orderkey").apply(PlanConfig())
    with pytest.raises(UsageError, match="in \\(0, 1000000\\)"):
        D.SAMPLE("1000000:o_orderkey").apply(PlanConfig())
    cfg = PlanConfig()
    D.QUERY("o_totalprice < 100.0", object_path="orders").apply(cfg)
    D.SAMPLE("250000:o_orderkey", object_path="orders").apply(cfg)
    # SAMPLE must NOT ride the QUERY pushdown slot (connectors embed
    # predicates verbatim into remote SQL; the md5/CONV hash is
    # Spark-dialect) — it fills the dedicated engine-side plan field.
    assert cfg.table_predicates["orders"] == "o_totalprice < 100.0"
    assert cfg.table_sample["orders"] == (250000, "o_orderkey")


def test_sample_roundtrip_python_reference(spark, sf_dir):
    """The exported sample is exactly the keys whose Python md5 hash64
    mod 1e6 falls below the threshold — auditable sampling."""
    got = {
        r.o_orderkey
        for r in datapump_roundtrip_sample(spark, sf_dir)
        .select("o_orderkey")
        .collect()
    }
    all_keys = [
        r.o_orderkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    expect = {
        k
        for k in all_keys
        if int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 1_000_000
        < SAMPLE_PPM
    }
    assert got == expect
    # the rate lands near the target (binomial noise at fixture sizes)
    assert 0.15 < len(expect) / len(all_keys) < 0.35


def test_share_of_parent_sums_and_rank(spark, sf_dir):
    """Shares within each region sum to ~1e6 and ranks are a
    permutation 1..|nations in region| ordered by revenue."""
    rows = nation_share_of_region(spark, sf_dir).collect()
    by_region: dict = defaultdict(list)
    for r in rows:
        by_region[r.region].append(r)
    assert sum(len(v) for v in by_region.values()) == 25
    for region, rs in by_region.items():
        s = sum(r.share_of_region_ppm for r in rs)
        assert 1_000_000 - len(rs) <= s <= 1_000_000
        assert sorted(r.rank_in_region for r in rs) == list(
            range(1, len(rs) + 1)
        )
        ordered = sorted(rs, key=lambda r: r.rank_in_region)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.revenue_cents, b.nation) >= (b.revenue_cents, a.nation)


def test_dormancy_partitions_customers(spark, sf_dir, duck_raw):
    """Bands partition the customer dimension exactly; never_ordered
    matches the anti-join count; lifetime revenue conserves."""
    rows = customer_dormancy_bands(spark, sf_dir).collect()
    n_cust = duck_raw.sql("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert sum(r.n_customers for r in rows) == n_cust
    never = duck_raw.sql(
        "SELECT COUNT(*) FROM customer c WHERE NOT EXISTS"
        " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ).fetchone()[0]
    got_never = next(
        (r.n_customers for r in rows if r.band == "never_ordered"), 0
    )
    assert got_never == never
    total_rev = duck_raw.sql(
        "SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders"
        " WHERE o_custkey IN (SELECT c_custkey FROM customer)"
    ).fetchone()[0]
    assert sum(r.lifetime_revenue_cents for r in rows) == (total_rev or 0)


def test_returns_python_reference(spark, sf_dir, duck_raw):
    rows = duck_raw.sql(
        "SELECT p.p_brand, l.l_returnflag,"
        " CAST(round(l.l_extendedprice * 100) AS BIGINT)"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for b, fl, rc in rows:
        a = agg[b]
        a[0] += 1
        a[2] += int(rc)
        if fl == "R":
            a[1] += 1
            a[3] += int(rc)
    got = {r.brand: r for r in returns_rate_by_brand(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for b, (n, nr, rev, rrev) in agg.items():
        r = got[b]
        assert (r.n_lines, r.n_returned) == (n, nr)
        assert r.returned_rev_ppm == rrev * 1_000_000 // max(rev, 1)


def test_sample_export_from_duckdb_source(spark, sf_dir, tmp_path):
    """SAMPLE must work when the SOURCE is a remote-SQL connector (the
    round-8 advisor finding: the old pushdown compiled a Spark-dialect
    md5/CONV predicate into DuckDB SQL and failed at bind time). The
    engine-side filter must also select the identical row set the
    parquet-source path selects."""
    from oracledb_datapump_spark import Job
    from oracledb_datapump_spark.base import JobMode, Operation
    from oracledb_datapump_spark.catalog import DuckDbConnector

    src = DuckDbConnector(":memory:")
    src.execute(
        f"CREATE TABLE hr_orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    src.execute("CREATE SCHEMA hr")
    src.execute("CREATE TABLE hr.orders AS SELECT * FROM hr_orders")
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("hr"),
            D.INCLUDE_TABLE("orders"),
            D.SAMPLE(f"{SAMPLE_PPM}:o_orderkey", object_path="orders"),
        ],
    ).run(wait=True, connection=src, spark=spark)
    assert st.job_state == "COMPLETED", st.error
    got = {
        r.o_orderkey
        for r in spark.read.parquet(f"{dump}/hr/orders").collect()
    }
    expect = {
        k
        for (k,) in src.execute("SELECT o_orderkey FROM hr.orders").fetchall()
        if int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 1_000_000
        < SAMPLE_PPM
    }
    assert got == expect and got


def test_sample_null_keys_excluded(spark, tmp_path):
    """Explicit NULL policy: rows whose sample column is NULL are
    excluded from the sample (documented in directives.Sample)."""
    from oracledb_datapump_spark import Job
    from oracledb_datapump_spark.base import JobMode, Operation
    from oracledb_datapump_spark.catalog import ParquetConnector

    srcdir = tmp_path / "src"
    (srcdir).mkdir()
    spark.createDataFrame(
        [(None, "a")] * 5 + [(i, "b") for i in range(200)],
        "k int, v string",
    ).coalesce(1).write.parquet(str(srcdir / "t.parquet"))
    dump = str(tmp_path / "dump")
    st = Job(
        Operation.EXPORT,
        JobMode.TABLE,
        dumpfiles=dump,
        directives=[
            D.INCLUDE_SCHEMA("main"),
            D.INCLUDE_TABLE("t"),
            D.SAMPLE("900000:k", object_path="t"),
        ],
    ).run(wait=True, connection=ParquetConnector(str(srcdir)), spark=spark)
    assert st.job_state == "COMPLETED", st.error
    out = spark.read.parquet(f"{dump}/main/t")
    assert out.filter("k IS NULL").count() == 0
    assert 0 < out.count() < 200
