"""Salted two-phase aggregation must equal the direct aggregation."""

from pyspark.sql import functions as F

from oracledb_datapump_spark.functions.skew import salted_agg, with_salt


def test_salted_agg_equals_direct(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        (r.l_returnflag,): (r.n, round(r.total, 2))
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,2)")).alias("total"),
        )
        .collect()
    }
    salted = salted_agg(
        l,
        ["l_returnflag"],
        [
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("l_quantity").cast("decimal(25,2)")).alias("s"),
        ],
        lambda pre: [F.sum("c").alias("n"), F.sum("s").alias("total")],
        n_salts=8,
        salt_from=["l_orderkey", "l_linenumber"],
    )
    got = {(r.l_returnflag,): (r.n, round(float(r.total), 2)) for r in salted.collect()}
    assert got == {k: (v[0], round(float(v[1]), 2)) for k, v in direct.items()}


def test_salt_is_deterministic(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100)
    a = with_salt(l, 8, ["l_orderkey"]).select("l_orderkey", "_salt").collect()
    b = with_salt(l, 8, ["l_orderkey"]).select("l_orderkey", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    salts = {r._salt for r in a}
    assert salts.issubset(set(range(8))) and len(salts) > 1
