"""Batch 71: ANOVA / Brown-Forsythe / Kruskal-Wallis family."""

import duckdb
import pytest

from oracledb_datapump_spark.operators.pipeline71 import (
    ANOVA_PRICE_SQL,
    KRUSKAL_WALLIS_SQL,
    KW_CHI2_CRIT_MILLI,
    LEVENE_SQL,
    anova_price_by_type,
    kruskal_wallis_price,
    levene_variance_check,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


@pytest.mark.parametrize(
    "fn,sql",
    [
        (anova_price_by_type, ANOVA_PRICE_SQL),
        (levene_variance_check, LEVENE_SQL),
        (kruskal_wallis_price, KRUSKAL_WALLIS_SQL),
    ],
    ids=["anova", "levene", "kruskal"],
)
def test_cross_engine_hash_sf0001(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir).toPandas()
    ddf = _duck(sf_dir, sql)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = (
        ddf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype(s.dtypes.to_dict())
    )
    assert s.equals(d)


@pytest.mark.parametrize(
    "fn", [anova_price_by_type, levene_variance_check], ids=["anova", "levene"]
)
def test_anova_family_decomposition(spark, sf_dir, fn):
    row = fn(spark, sf_dir).collect()[0]
    assert row["k_groups"] >= 2
    assert row["n"] > row["k_groups"]
    # sums of squares are non-negative (up to the shared truncation)
    assert row["ssb_q"] >= -row["k_groups"]
    assert row["ssw_q"] >= 0
    assert row["f_milli"] >= 0
    assert bool(row["signif_flag"]) == (row["f_milli"] > 2_214)


def test_kruskal_bounds(spark, sf_dir):
    row = kruskal_wallis_price(spark, sf_dir).collect()[0]
    assert row["k_groups"] >= 2
    # H is bounded by n-1 (all mass in one group ordering)
    assert -row["k_groups"] * 1000 <= row["h_milli"] <= (row["n"] - 1) * 1000
    assert bool(row["signif_flag"]) == (row["h_milli"] > KW_CHI2_CRIT_MILLI)
