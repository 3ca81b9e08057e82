"""Streaming near-duplicate detection at ingestion: MinHash-LSH over a
growing band index, one micro-batch per arrival file.

The batch operator family (operators/dedup.py) answers "find the dups
in this corpus"; this module answers the production question "find each
NEW document's dups the moment it arrives". Per micro-batch:

1. band signatures for the arriving docs (same 16-hash/4-band family
   as the batch path — one source of truth for the constants);
2. candidate pairs = new bands ⋈ (stored index ∪ this batch), keyed on
   (band, sig) with the arriving side being the higher doc_id (arrival
   files are ascending doc_id ranges, so 'newer' ≡ 'greater');
3. exact-Jaccard verification of the candidates against the source
   store (point reads of the candidate docs only);
4. append the batch's bands to the index and the verified pairs to the
   output — both plain parquet appends, idempotent per batch.

CONVERGENCE CONTRACT (the gated claim): after the stream drains, the
accumulated pair set equals the BATCH dedup of the full corpus
(dedup_minhash_verified) with roles (new = greater id, old = lesser) —
streaming ingestion loses nothing and invents nothing vs the offline
job. The oracle is the batch SQL re-rolled into those roles plus each
pair's arrival batch (reconstructable from the tercile cuts, which pins
the micro-batch attribution too).

At 100 TB: the band index is the stored state (doc_id, band, sig —
corpus-scale but narrow), each arrival joins only its own bands against
it, and verification touches candidate docs only. The file source
stands in for Kafka; maxFilesPerTrigger=1 gives one batch per arrival.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    BAND_ROWS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    DEDUP_MINHASH_VERIFIED_SQL,
    _minhash_cols,
    _shingles,
    _shingles_multiset,
)
from .incremental import _land_single_parquet, land_slices_single_pass

PAIR_SCHEMA = (
    "new_doc long, old_doc long, jaccard double, arrival_batch long"
)


def _read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Read the accumulated pair appends; an empty dir (pair-free
    drain) yields an empty frame of the same schema. r17: replaces the
    per-run empty schema-seed write (one write job + one extra file in
    every later read, paid on every invocation for a case that only
    occurs on a degenerate corpus)."""
    if any(
        n.endswith(".parquet")
        for n in os.listdir(pairs_dir)
        if not n.startswith(("_", "."))
    ):
        return spark.read.schema(PAIR_SCHEMA).parquet(pairs_dir)
    return spark.createDataFrame([], PAIR_SCHEMA)


def _bands_for(docs: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, sig) for the given docs — the same construction as
    dedup_minhash_pairs (dedup.py:226), parameterized by doc frame.

    r17 (guide §2.2): an arriving micro-batch is ONE file → one scan
    partition, so the tokenize→shingle→16-hash build (the dominant
    per-batch cost — ~2.5 s of the ~5.5 s micro-batch loop at sf0.1)
    ran on one core of the session; widen to session parallelism when
    narrower — a no-op whenever the arrival batch is already wide."""
    from ..functions.partitioning import widen_small_scan

    agg = _shingles_multiset(
        spark, sf_dir, widen_small_scan(docs)
    ).groupBy("doc_id").agg(
        *_minhash_cols()
    )
    band_sig = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{j}").cast("string")
                    for j in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
                ],
            )
        ).alias(f"sig{b}")
        for b in range(NUM_HASHES // BAND_ROWS)
    ]
    return agg.select(
        "doc_id", F.posexplode(F.array(*band_sig)).alias("band", "sig")
    )


def run_streaming_dedup(
    spark: SparkSession,
    sf_dir: str,
    src_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
) -> None:
    """One availableNow cycle over the arrival dir: per micro-batch,
    find the arriving docs' verified near-dups against everything seen
    so far (index + the batch itself) and grow the index."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_b = _bands_for(batch_df, spark, sf_dir).localCheckpoint(
            eager=True
        )  # joined below AND appended to the index
        seen_b = new_b
        if any(
            n.endswith(".parquet")
            for n in os.listdir(index_dir)
            if not n.startswith(("_", "."))
        ):
            # explicit schema: skips the per-batch footer-sampling
            # schema inference over the accumulated index files (§6)
            seen_b = spark.read.schema(new_b.schema).parquet(
                index_dir
            ).unionByName(new_b)
        a = new_b.alias("a")
        b = seen_b.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("new_doc"),
                F.col("b.doc_id").alias("old_doc"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # grow the index regardless of whether this batch found pairs.
        # r17 (§6): ONE file per micro-batch append — the checkpointed
        # band frame carries the shuffle width (32 near-empty files per
        # batch before), and every later batch re-lists and re-opens
        # the whole dir; at scale this is the standard "don't write a
        # task-count of tiny files per micro-batch" hygiene (the
        # compaction lifecycle gate covers consolidation separately)
        new_b.coalesce(1).write.mode("append").parquet(index_dir)
        if cand.isEmpty():
            return
        # verification: exact Jaccard from the SOURCE store, candidate
        # docs only (the point-read pattern — never a corpus rescan)
        cand_docs = (
            cand.select(F.col("new_doc").alias("doc_id"))
            .union(cand.select(F.col("old_doc").alias("doc_id")))
            .distinct()
        )
        # r16 (guide §1.2): semi-filter the SOURCE rows before
        # tokenizing — the old order shingled the ENTIRE corpus every
        # micro-batch and only then kept the candidates. Same shingle
        # set (the semi-join commutes with the row-local shingling);
        # the point-read now really is candidate-docs-only. Pinned
        # once: sizes + both verify probes ride it.
        cand_src = spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).join(F.broadcast(cand_docs), "doc_id", "semi")
        # r17 negative result: widening cand_src before the shingling
        # was A/B-measured 1.36× on the verify phase (the candidate
        # text pays an exchange while the shingle stream feeds an
        # immediate groupBy shuffle anyway — the same reason the r16
        # docs_source widen was reverted). Left unwidened.
        sh = _shingles(spark, sf_dir, docs=cand_src).localCheckpoint(
            eager=True
        )
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        sa = sh.select(
            F.col("doc_id").alias("new_doc"), F.col("shingle").alias("sh_a")
        )
        sb = sh.select(
            F.col("doc_id").alias("_old2"), F.col("shingle").alias("sh_b")
        )
        inter = (
            cand.join(sa, "new_doc")
            .join(
                sb,
                (F.col("old_doc") == F.col("_old2"))
                & (F.col("sh_a") == F.col("sh_b")),
            )
            .groupBy("new_doc", "old_doc")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        na = sizes.select(
            F.col("doc_id").alias("new_doc"), F.col("n").alias("na")
        )
        nb = sizes.select(
            F.col("doc_id").alias("old_doc"), F.col("n").alias("nb")
        )
        verified = (
            inter.join(F.broadcast(na), "new_doc")
            .join(F.broadcast(nb), "old_doc")
            .select(
                "new_doc",
                "old_doc",
                (
                    F.col("inter")
                    / (F.col("na") + F.col("nb") - F.col("inter"))
                ).alias("jaccard"),
                F.lit(batch_id).cast("long").alias("arrival_batch"),
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        )
        verified.write.mode("append").parquet(pairs_dir)

    docs_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(new_doc, old_doc, jaccard, arrival_batch): the full streaming-
    ingestion dedup lifecycle under the driver hash — the documents
    fixture arrives as three ascending-doc_id tercile files, one
    micro-batch each; every batch joins its band signatures against the
    accumulated index (plus itself), verifies candidates with exact
    Jaccard, and appends. Hash equality against the BATCH verified-pair
    oracle (roles re-rolled to new=greater id; arrival batch
    reconstructed from the tercile cuts) is the convergence proof:
    streaming ingestion finds exactly the offline job's pairs, each in
    the micro-batch where its newer member arrived."""
    src = tempfile.mkdtemp(prefix="dp_slsh_src_")
    index_dir = tempfile.mkdtemp(prefix="dp_slsh_idx_")
    pairs_dir = tempfile.mkdtemp(prefix="dp_slsh_pairs_")
    ckpt = tempfile.mkdtemp(prefix="dp_slsh_ckpt_")
    try:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.agg(F.max("doc_id") + 1).collect()[0][0]
        c1, c2 = n // 3, 2 * n // 3
        # r17 (§6): all three tercile arrival files land in ONE corpus
        # pass (partitionBy on the tercile id) — the per-slice
        # filtered coalesce(1) staging paid three full single-task
        # corpus scans before the stream even started
        land_slices_single_pass(
            d,
            F.when(F.col("doc_id") < c1, 0)
            .when(F.col("doc_id") < c2, 1)
            .otherwise(2),
            3,
            src,
        )
        run_streaming_dedup(spark, sf_dir, src, index_dir, pairs_dir, ckpt)
        # temp dirs are deleted below — pin rows first
        return (
            _read_pairs(spark, pairs_dir)
            .orderBy("new_doc", "old_doc")
            .localCheckpoint(eager=True)
        )
    finally:
        for p in (src, index_dir, pairs_dir, ckpt):
            shutil.rmtree(p, ignore_errors=True)


def streaming_dedup_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_dedup_incremental's pair contract with an index
    COMPACTION between arrivals (r10 verdict ask #4): the stored band
    index grows by one parquet append per micro-batch — file-count
    hygiene at 100 TB demands periodic consolidation, and this gate
    proves consolidation is INVISIBLE to the dedup results. Lifecycle:
    drain terciles 0–1 (two micro-batches, each appending dozens of
    small index files), run the real datapump COMPACT pass over the
    index (DumpSet.compact — coalesce-to-target + atomic double-rename
    swap + TABLE_COMPACTED event, the same machinery the
    datapump_roundtrip_compact lifecycle gates), then land tercile 2
    and drain again so the THIRD batch joins against the compacted
    index. Hash equality with the batch oracle (identical to the
    incremental contract, arrival batches intact across the restart)
    plus the ``was_fragmented``/``compacted``/``compaction_logged``
    sentinels is the invariance proof: the index survives maintenance
    with zero pairs lost, invented, or re-attributed."""
    src = tempfile.mkdtemp(prefix="dp_slshc_src_")
    idx_root = tempfile.mkdtemp(prefix="dp_slshc_idxroot_")
    pairs_dir = tempfile.mkdtemp(prefix="dp_slshc_pairs_")
    ckpt = tempfile.mkdtemp(prefix="dp_slshc_ckpt_")
    # the index lives as a table inside a dump-set layout so the real
    # COMPACT pass (dumpset.py:206) can maintain it
    index_dir = os.path.join(idx_root, "main", "band_index")
    os.makedirs(index_dir)

    def _index_files() -> list[str]:
        return [
            n
            for n in os.listdir(index_dir)
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        ]

    try:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.agg(F.max("doc_id") + 1).collect()[0][0]
        c1, c2 = n // 3, 2 * n // 3
        # phase 1: terciles 0 and 1 arrive and drain (batches 0, 1)
        _land_single_parquet(
            d.filter(F.col("doc_id") < c1),
            os.path.join(src, "docs-0.parquet"),
        )
        _land_single_parquet(
            d.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
            os.path.join(src, "docs-1.parquet"),
        )
        run_streaming_dedup(spark, sf_dir, src, index_dir, pairs_dir, ckpt)
        # maintenance window: compact the band index with the datapump
        # COMPACT pass (coalesce, never a shuffle; atomic swap)
        from ..dumpset import DumpSet

        files_before = len(_index_files())
        ds = DumpSet(idx_root)
        ds.compact(spark, target_file_bytes=1 << 40)
        files_after = len(_index_files())
        compaction_logged = any(
            e["event"] == "TABLE_COMPACTED"
            and e["table"] == "main.band_index"
            for e in ds.read_events()
        )
        # the rewrite replaced every index file under new names; drop any
        # cached listing so batch 2's fresh read lists the new layout
        spark.catalog.refreshByPath(index_dir)
        # phase 2: tercile 2 arrives; the checkpoint resumes numbering at
        # batch 2 and its candidates join the COMPACTED index
        _land_single_parquet(
            d.filter(F.col("doc_id") >= c2),
            os.path.join(src, "docs-2.parquet"),
        )
        run_streaming_dedup(spark, sf_dir, src, index_dir, pairs_dir, ckpt)
        return (
            _read_pairs(spark, pairs_dir)
            .withColumn("was_fragmented", F.lit(files_before >= 2))
            .withColumn("compacted", F.lit(files_after < files_before))
            .withColumn("compaction_logged", F.lit(compaction_logged))
            .orderBy("new_doc", "old_doc")
            .localCheckpoint(eager=True)
        )
    finally:
        for p in (src, idx_root, pairs_dir, ckpt):
            shutil.rmtree(p, ignore_errors=True)


def _streaming_dedup_sql() -> str:
    base = DEDUP_MINHASH_VERIFIED_SQL.replace("ORDER BY doc_a, doc_b", "")
    return f"""
WITH pairs AS ({base}),
mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents)
SELECT doc_b AS new_doc, doc_a AS old_doc, jaccard,
       CAST(CASE WHEN doc_b < n // 3 THEN 0
                 WHEN doc_b < 2 * n // 3 THEN 1
                 ELSE 2 END AS BIGINT) AS arrival_batch
FROM pairs, mx
ORDER BY new_doc, old_doc
"""


STREAMING_DEDUP_INCREMENTAL_SQL = _streaming_dedup_sql()

STREAMING_DEDUP_COMPACTED_SQL = _streaming_dedup_sql().replace(
    "       CAST(CASE WHEN doc_b < n // 3 THEN 0",
    "       TRUE AS was_fragmented, TRUE AS compacted,\n"
    "       TRUE AS compaction_logged,\n"
    "       CAST(CASE WHEN doc_b < n // 3 THEN 0",
)
