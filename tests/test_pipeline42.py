"""Batch-42 property tests."""

import pytest

from oracledb_datapump_spark.operators.pipeline42 import (
    COHERENT_SAMPLE_PPM,
    SPAN_CORRUPT_PPM,
    coherent_sample_counts,
    dedup_savings_report,
    span_corruption_plan,
    template_prefix_histogram,
)


def test_coherent_sample_integrity(spark, sf_dir):
    rows = {r["table_name"]: r for r in coherent_sample_counts(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "lineitem", "orders"}
    for r in rows.values():
        assert r["fk_orphans"] == 0  # referential integrity preserved
        assert 0 < r["n_sampled"] <= r["n_total"]
    # orders share tracks the hash ppm; lineitem share tracks orders share
    # (lines ride their order wholesale)
    o = rows["orders"]
    assert abs(o["share_ppm"] - COHERENT_SAMPLE_PPM) < 120_000
    assert abs(rows["lineitem"]["share_ppm"] - o["share_ppm"]) < 120_000


def test_dedup_savings_consistency(spark, sf_dir):
    r = dedup_savings_report(spark, sf_dir).collect()[0]
    assert r["docs_removable"] >= r["n_groups_multi"]  # each multi-group drops >=1
    assert 0 <= r["savings_ppm"] < 1_000_000
    if r["n_groups_multi"] == 0:
        assert r["chars_removable"] == 0


def test_template_histogram_accounts_every_doc(spark, sf_dir):
    rows = template_prefix_histogram(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["group_size"] * r["n_groups"]


def test_span_plan_arithmetic(spark, sf_dir):
    rows = span_corruption_plan(spark, sf_dir).collect()
    for r in rows[:200]:
        assert r["n_corrupted"] == r["n_tokens"] * SPAN_CORRUPT_PPM // 10**6
        if r["n_spans"]:
            # inputs+targets conserve tokens plus sentinels and the EOS
            assert (
                r["inputs_len"] + r["targets_len"]
                == r["n_tokens"] + 2 * r["n_spans"] + 1
            )
            assert r["n_spans"] <= r["n_corrupted"]
        else:
            assert r["targets_len"] == 0 and r["inputs_len"] == r["n_tokens"]


def test_training_shuffle_reshuffles_across_epochs(spark, sf_dir):
    from oracledb_datapump_spark.operators.pipeline42 import (
        SHUFFLE_EPOCHS,
        SHUFFLE_SHARDS,
        training_shuffle_plan,
    )

    rows = training_shuffle_plan(spark, sf_dir).collect()
    assert len(rows) == SHUFFLE_EPOCHS * SHUFFLE_SHARDS
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for e in range(SHUFFLE_EPOCHS):
        per_epoch = [r for r in rows if r["epoch"] == e]
        assert sum(r["n_docs"] for r in per_epoch) == n_docs
    # the epoch salt actually reshuffles: shard compositions differ
    e0 = tuple(r["n_docs"] for r in rows if r["epoch"] == 0)
    e1 = tuple(r["n_docs"] for r in rows if r["epoch"] == 1)
    assert e0 != e1 or n_docs < SHUFFLE_SHARDS
    for r in rows:
        assert 0 < r["top_source_share_ppm"] <= 1_000_000


def test_energy_curve_monotone_to_full(spark, sf_dir):
    from oracledb_datapump_spark.operators.pipeline42 import (
        ENERGY_PREFIX_KS,
        embedding_dim_energy_curve,
    )

    rows = embedding_dim_energy_curve(spark, sf_dir).collect()
    assert [r["k"] for r in rows] == list(ENERGY_PREFIX_KS)
    shares = [r["energy_ppm"] for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))  # cumulative
    assert shares[-1] == 1_000_000  # k=64 is the whole vector
    assert 0 < shares[0] < 1_000_000


def test_matryoshka_recall_monotone_and_identity(spark, sf_dir):
    from oracledb_datapump_spark.operators.pipeline42 import (
        MATRYOSHKA_DIMS,
        matryoshka_recall_curve,
    )

    rows = matryoshka_recall_curve(spark, sf_dir).collect()
    assert [r["dims"] for r in rows] == list(MATRYOSHKA_DIMS)
    assert rows[-1]["recall_ppm"] == 1_000_000  # full-dim identity row
    for r in rows:
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert r["n_probes"] >= 10
