"""values_df (functions/local_table) — the JVM-literal replacement for
createDataFrame(list) on small driver-side tables. The contract that
matters: bit-exact values (including hostile strings and arrays), a
plan with NO PythonRDD leaf, preserved row order, and schema parity
with createDataFrame."""

from pyspark.sql import functions as F

from oracledb_datapump_spark.functions.local_table import values_df


def test_values_matches_createdataframe(spark):
    rows = [
        (1, "plain", 3.5, True, [1, 2, 3]),
        (2, "quo'te \\ back\nline\ttab", -0.0, False, []),
        (3, None, None, None, None),
        (-(2**62), "unicode é中文 $'%s`", 1e-300, True, [0]),
    ]
    schema = "i long, s string, d double, b boolean, a array<long>"
    got = values_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    # values and (name, type) pairs are bit-identical; nullability is
    # deliberately stricter (see the helper's schema note)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    assert got.collect() == want.collect()


def test_values_no_python_leaf_and_order(spark):
    rows = [(i, f"s{i}") for i in range(10, 0, -1)]
    df = values_df(spark, rows, "k long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "applySchemaToPythonRDD" not in plan
    assert [r.k for r in df.collect()] == list(range(10, 0, -1))


def test_values_arrow_path_matches(spark):
    # > LITERAL_MAX_CELLS cells forces the Arrow path; values must stay
    # bit-identical to createDataFrame, including arrays and NULLs
    rows = [(i, f"s'{i}\\x", float(i) / 7, [i, i * 2, None]) for i in range(200)]
    rows.append((9999, None, None, None))
    schema = "i long, s string, d double, a array<long>"
    got = values_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    assert got.collect() == want.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "applySchemaToPythonRDD" not in plan


def test_values_empty(spark):
    df = values_df(spark, [], "k long, s string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "s"]
