"""Behavioral checks for the sampling/mixing/privacy operators (oracle
equality is covered by test_queries_oracle)."""

from pyspark.sql import functions as F

from oracledb_datapump_spark.operators import privacy as PV
from oracledb_datapump_spark.operators import sampling as SP


def test_stratified_sample_caps_and_determinism(spark, sf_dir):
    out = SP.stratified_sample(spark, sf_dir)
    per = out.groupBy("lang_pred").count().collect()
    assert per, "sample must be non-empty"
    assert all(r["count"] <= SP.STRATUM_CAP for r in per), per
    # ranks are 1..k dense within each stratum
    dense = (
        out.groupBy("lang_pred")
        .agg(F.max("sample_rank").alias("mx"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("mx") != F.col("n"))
        .count()
    )
    assert dense == 0
    a = {(r.doc_id, r.sample_rank) for r in out.collect()}
    b = {(r.doc_id, r.sample_rank) for r in SP.stratified_sample(spark, sf_dir).collect()}
    assert a == b, "hash-ordered sampling must be run-deterministic"


def test_mix_weights_rebalances(spark, sf_dir):
    w = SP.mix_weights(spark, sf_dir).select("lang_pred", "n_stratum", "weight_ppm")
    strata = {r.lang_pred: (r.n_stratum, r.weight_ppm) for r in w.distinct().collect()}
    assert len(strata) >= 2, "fixture should have multiple language strata"
    # rarer stratum => strictly larger weight; expected mass ~ uniform:
    # n_stratum * weight_ppm within one floor-step of 1e6 * n_total / n_strata
    ordered = sorted(strata.values())
    for (n1, w1), (n2, w2) in zip(ordered, ordered[1:]):
        if n1 < n2:
            assert w1 > w2, strata
    n_total = sum(n for n, _ in strata.values())
    target = SP.WEIGHT_SCALE * n_total / len(strata)
    for n, ppm in strata.values():
        assert target - n <= n * ppm <= target, strata


def test_pii_redact_scrubs_everything(spark, sf_dir):
    out = PV.pii_redact(spark, sf_dir)
    leftovers = out.filter(
        F.col("clean_text").rlike(PV.EMAIL_RE)
        | F.col("clean_text").rlike(PV.IPV4_RE)
        | F.col("clean_text").rlike(PV.PHONE_RE)
    ).count()
    assert leftovers == 0
    found = out.agg(
        F.sum("n_email").alias("e"), F.sum("n_ip").alias("i"), F.sum("n_phone").alias("p")
    ).collect()[0]
    assert found.e > 0 and found.i > 0 and found.p > 0
    marked = out.filter(F.col("clean_text").contains("<EMAIL>")).count()
    assert marked == found.e


def test_hll_estimate_accuracy(spark, sf_dir):
    """HLL with m=512 has ~4.6% std error; every group must land within
    15% of exact (and the linear-counting branch must engage sanely at
    small cardinalities)."""
    from oracledb_datapump_spark.operators import sketches as SK

    rows = SK.hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.hll_estimate - r.exact_distinct) / max(r.exact_distinct, 1)
        assert err < 0.15, (r.o_orderpriority, r.exact_distinct, r.hll_estimate)


def test_cms_never_undercounts(spark, sf_dir):
    from oracledb_datapump_spark.operators import sketches as SK

    rows = SK.cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == SK.CMS_TOPK
    for r in rows:
        assert r.est_count >= r.exact_count, (r.token, r.est_count, r.exact_count)
