"""Behavioral checks for the corpus-prep and clustering operators
(cross-engine parity is covered by test_queries_oracle)."""

from pyspark.sql import functions as F

from oracledb_datapump_spark.operators import clustering as CL
from oracledb_datapump_spark.operators import textprep as TP


def test_corpus_split_fractions(spark, sf_dir):
    rows = TP.corpus_split(spark, sf_dir).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in rows}
    total = sum(by.values())
    assert set(by) == {"train", "val", "test"}
    assert 0.7 < by["train"] / total < 0.9
    assert by["val"] / total < 0.2 and by["test"] / total < 0.2


def test_quality_gopher_mixed_outcomes(spark, sf_dir):
    df = TP.quality_gopher(spark, sf_dir)
    n_pass = df.filter("passes").count()
    n_all = df.count()
    assert 0 < n_pass < n_all  # rules discriminate, not rubber-stamp


def test_contamination_flags_near_dups(spark, sf_dir):
    df = TP.contamination_ngram(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0  # the corpus plants near-duplicates
    for r in rows:
        assert r.train_doc_id % 10 != 0  # never flags the eval slice
        assert r.n_shared_grams >= r.n_eval_docs >= 1


def test_vocab_ngram_counts_ordered(spark, sf_dir):
    rows = TP.vocab_ngram_counts(spark, sf_dir).collect()
    assert len(rows) == TP.VOCAB_TOP_K
    occ = [r.n_occurrences for r in rows]
    assert occ == sorted(occ, reverse=True)
    assert all(" " in r.gram for r in rows)  # bigrams


def test_kmeans_deterministic_and_complete(spark, sf_dir):
    a1 = CL.kmeans_assign(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows1 = a1.collect()
    assert len(rows1) == n_docs  # every vector assigned exactly once
    clusters = {r.cluster for r in rows1}
    assert 1 < len(clusters) <= CL.KMEANS_K
    rows2 = CL.kmeans_assign(spark, sf_dir).collect()
    assert rows1 == rows2  # repartition/run-order independent


def test_kmeans_assigns_nearest_final_centroid(spark, sf_dir):
    # dist_sq must be the min over final centroids: re-derive one vector's
    # distance to its own cluster centroid lower-bounds nothing else.
    sizes = CL.cluster_sizes(spark, sf_dir).collect()
    assert sum(r.n_members for r in sizes) == 500
    assert all(r.avg_dist_sq >= 0 for r in sizes)


def test_load_docs_absorbs_int32_and_rejects_bad_shapes(spark, tmp_path):
    """documents fixture-drift absorber: int32 doc_id normalizes to
    BIGINT; a missing text column or non-integral doc_id fails loudly
    (the r3 events-ts lesson applied to the documents table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from oracledb_datapump_spark.operators.docs_source import load_docs

    d32 = tmp_path / "docs32"
    d32.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int32()),
            "text": pa.array(["a b c", "d e f"]),
        }),
        str(d32 / "documents.parquet"),
    )
    out = load_docs(spark, str(d32))
    assert dict(out.dtypes)["doc_id"] == "bigint"
    assert out.count() == 2

    dbad = tmp_path / "docsbad"
    dbad.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int64())}),
        str(dbad / "documents.parquet"),
    )
    with pytest.raises(ValueError, match="lacks required"):
        load_docs(spark, str(dbad))

    dstr = tmp_path / "docsstr"
    dstr.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(["x"], pa.string()),
            "text": pa.array(["a"]),
        }),
        str(dstr / "documents.parquet"),
    )
    with pytest.raises(ValueError, match="non-integral"):
        load_docs(spark, str(dstr))


def test_load_embeddings_absorbs_int32_and_double_vec(spark, tmp_path):
    """embeddings fixture-drift absorber: int32 vec_id normalizes to
    BIGINT, float64 vectors pass through, missing columns fail loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from oracledb_datapump_spark.operators.emb_source import load_embeddings

    d = tmp_path / "emb32"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array([1, 2], pa.int32()),
            "embedding": pa.array([[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float64())),
        }),
        str(d / "embeddings.parquet"),
    )
    out = load_embeddings(spark, str(d))
    assert dict(out.dtypes)["vec_id"] == "bigint"
    assert out.count() == 2

    bad = tmp_path / "embbad"
    bad.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array([1], pa.int64())}),
        str(bad / "embeddings.parquet"),
    )
    with pytest.raises(ValueError, match="lacks required"):
        load_embeddings(spark, str(bad))
