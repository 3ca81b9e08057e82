"""Property-based tests (hypothesis) for the pure helpers."""

from hypothesis import given, settings
from hypothesis import strategies as st

from oracledb_datapump_spark.directives import (
    DirectiveBase,
    compile_directives,
)
from oracledb_datapump_spark.util import string_shortener


@given(st.text(min_size=0, max_size=500), st.integers(min_value=12, max_value=200))
@settings(max_examples=200)
def test_string_shortener_invariants(value, max_length):
    out = string_shortener(value, max_length)
    assert len(out) <= max_length
    if len(value) <= max_length:
        assert out == value
    # deterministic
    assert out == string_shortener(value, max_length)


@given(
    st.lists(
        st.sampled_from(
            [
                {"name": "INCLUDE_SCHEMA", "value": "s1"},
                {"name": "INCLUDE_TABLE", "value": "t1"},
                {"name": "PARALLEL", "value": 4},
                {"name": "COMPRESSION", "value": "ALL"},
                {"name": "COMPRESSION_ALGORITHM", "value": "MEDIUM"},
                {"name": "TABLE_EXISTS_ACTION", "value": "APPEND"},
                {"name": "REMAP_SCHEMA", "old_value": "a", "value": "b"},
                {"name": "FLASHBACK_SCN", "value": 42},
                {"name": "LOGTIME", "value": "ALL"},
                {"name": "METRICS", "value": True},
            ]
        ),
        max_size=8,
    )
)
@settings(max_examples=100)
def test_directive_json_roundtrip_stable(dicts):
    """from_dict → to_dict → from_dict must be a fixed point, and
    compilation must be deterministic over the same list."""
    d1 = [DirectiveBase.from_dict(d) for d in dicts]
    d2 = [DirectiveBase.from_dict(x.to_dict()) for x in d1]
    assert [x.to_dict() for x in d1] == [x.to_dict() for x in d2]
    c1 = compile_directives(d1)
    c2 = compile_directives(d2)
    assert c1 == c2


def test_exact_ntile_matches_duckdb_ntile(spark):
    """exact_ntile must reproduce ANSI NTILE for every (n_rows, n_tiles)
    shape — including n_rows < n_tiles, exact division, and remainder
    cases — since curriculum_order's hash gate rides on it."""
    import duckdb

    from pyspark.sql import functions as F

    from oracledb_datapump_spark.functions.global_order import exact_ntile

    for n_rows, n_tiles in [(1, 4), (3, 4), (4, 4), (5, 4), (7, 3), (12, 5), (100, 7)]:
        want = [
            r[0]
            for r in duckdb.sql(
                f"SELECT NTILE({n_tiles}) OVER (ORDER BY i) FROM range({n_rows}) t(i)"
            ).fetchall()
        ]
        df = spark.range(1, n_rows + 1).select(
            F.col("id").alias("rk"),
            exact_ntile(F.col("id"), n_rows, n_tiles).alias("tile"),
        )
        got = [r.tile for r in df.orderBy("rk").collect()]
        assert got == want, (n_rows, n_tiles, got, want)


def test_exact_ntile_formula_property():
    """Property sweep (no Spark): the pure arithmetic behind exact_ntile
    must match ANSI NTILE for arbitrary (n_rows, n_tiles) — the Spark
    expression is this formula verbatim, so pinning the formula pins the
    column."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def formula(rank, n, k):
        q, r = divmod(n, k)
        big = r * (q + 1)
        if q == 0:
            return rank
        if rank <= big:
            return (rank - 1) // (q + 1) + 1
        return r + (rank - 1 - big) // q + 1

    def ansi_ntile(n, k):
        # reference implementation: first n%k tiles get n//k+1 rows
        out, rank = [], 1
        q, r = divmod(n, k)
        for tile in range(1, k + 1):
            size = q + (1 if tile <= r else 0)
            out.extend([tile] * size)
        return out

    @settings(max_examples=200, deadline=None)
    @given(n=st.integers(1, 400), k=st.integers(1, 20))
    def check(n, k):
        want = ansi_ntile(n, k)
        got = [formula(rank, n, k) for rank in range(1, n + 1)]
        assert got == want, (n, k)

    check()
