"""Streaming LSH ingestion dedup: convergence to batch + per-batch
attribution invariants."""

from collections import defaultdict

from oracledb_datapump_spark.streaming.lsh import streaming_dedup_incremental


def test_converges_to_batch_and_attributes_batches(spark, sf_dir):
    from oracledb_datapump_spark.operators.dedup import dedup_minhash_verified

    rows = streaming_dedup_incremental(spark, sf_dir).collect()
    got = {(r.new_doc, r.old_doc) for r in rows}
    # convergence: exactly the batch pair set, roles = (greater, lesser)
    batch = {
        (max(r.doc_a, r.doc_b), min(r.doc_a, r.doc_b))
        for r in dedup_minhash_verified(spark, sf_dir).collect()
    }
    assert got == batch
    # roles: the new side arrived no earlier than the old side
    for r in rows:
        assert r.new_doc > r.old_doc
    # attribution: a pair lands in the micro-batch of its NEWER member
    # (tercile cuts by doc_id), and the stream really ran 3 batches'
    # worth of arrivals when pairs span the timeline
    import pyarrow.parquet as pq

    n = (
        max(
            pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["doc_id"]
            ).to_pydict()["doc_id"]
        )
        + 1
    )
    c1, c2 = n // 3, 2 * n // 3
    for r in rows:
        want = 0 if r.new_doc < c1 else (1 if r.new_doc < c2 else 2)
        assert r.arrival_batch == want
    per_batch = defaultdict(int)
    for r in rows:
        per_batch[r.arrival_batch] += 1
    # cross-batch pairs must exist (old member in an EARLIER tercile) —
    # otherwise the index-join path was never exercised
    assert any(
        (0 if r.old_doc < c1 else (1 if r.old_doc < c2 else 2))
        < r.arrival_batch
        for r in rows
    ), "no cross-batch pair — the stored-index join went untested"


def test_compaction_invariance(spark, sf_dir):
    """streaming_dedup_compacted (r10 verdict ask #4): the datapump
    COMPACT pass over the band index between arrivals must not change
    the drained pair set — same pairs, same jaccards, same arrival
    batches as the uncompacted run — and the sentinels must prove the
    compaction actually happened (fragmented before, fewer files after,
    TABLE_COMPACTED logged)."""
    from oracledb_datapump_spark.streaming.lsh import (
        streaming_dedup_compacted,
    )

    plain = {
        (r.new_doc, r.old_doc): (r.jaccard, r.arrival_batch)
        for r in streaming_dedup_incremental(spark, sf_dir).collect()
    }
    rows = streaming_dedup_compacted(spark, sf_dir).collect()
    assert rows, "fixture produced no near-dup pairs"
    for r in rows:
        assert r.was_fragmented and r.compacted and r.compaction_logged
    compacted = {
        (r.new_doc, r.old_doc): (r.jaccard, r.arrival_batch) for r in rows
    }
    assert compacted == plain, "compaction changed the pair contract"
