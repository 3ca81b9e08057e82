"""Streaming vector-index maintenance: PQ-encode embeddings as they
arrive, against a FROZEN codebook.

The production pattern for a 100 TB vector store: the PQ codebook is
trained offline (a model artifact, versioned with the index); new
vectors are encoded online as they land — a stateless row-local map, so
the stream needs no watermark and no aggregation state, just the
broadcast codebook. Re-training is a separate offline job followed by a
re-encode; this module is the online half.

``streaming_pq_codes`` proves the incremental path under the
cross-engine hash gate: the embeddings fixture is staged as two files,
drained in two checkpointed availableNow cycles (cycle 2 encodes ONLY
the newly-landed file), and the accumulated sink must equal the batch
``operators.pq.embedding_pq_codes`` — stated in SQL via the same
unrolled-fit oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pq as PQ


def stream_pq_encode(
    spark: SparkSession, src_dir: str, packed: DataFrame
) -> DataFrame:
    """Streaming (vec_id, code_0..code_{M-1}, recon_err) against the
    broadcast frozen codebook — a stream-static broadcast cross join
    plus row-local argmin; zero streaming state."""
    schema = spark.read.parquet(src_dir).schema
    raw = spark.readStream.schema(schema).parquet(src_dir)
    # the quantizer and the output projection are the SAME helpers the
    # batch operator uses — the bit-for-bit streaming-equals-batch gate
    # depends on there being exactly one copy of each expression
    q = raw.select("vec_id", PQ.quantize_expr().alias("qv"))
    return PQ.codes_select(PQ._with_codes(q, packed))


def run_pq_encode_cycle(
    spark: SparkSession, src_dir: str, out_dir: str, packed: DataFrame
) -> dict:
    """One availableNow drain of the encode stream with a persistent
    checkpoint — files already processed in earlier cycles are skipped
    by the source's checkpointed file log."""
    q = (
        stream_pq_encode(spark, src_dir, packed)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "codes"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"sink_path": os.path.join(out_dir, "codes")}


def streaming_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, code_0..code_3, recon_err): two checkpointed
    availableNow cycles over a time-split embeddings source (first half,
    then second half landing later), encoded against the codebook fit
    offline on the full table. The accumulated sink must match batch
    ``embedding_pq_codes`` exactly — which it does iff cycle 2 encoded
    only the new file and the frozen codebook broadcast is bit-stable
    across cycles. Hash-gated via the batch oracle."""
    import pyarrow.parquet as pq_
    import pyarrow.compute as pc

    books = PQ._fit_codebooks(spark, sf_dir)
    packed = PQ._packed_codebooks(spark, books)
    src = tempfile.mkdtemp(prefix="dp_pqenc_src_")
    out = tempfile.mkdtemp(prefix="dp_pqenc_out_")
    try:
        tbl = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        mid = pc.min_max(tbl["vec_id"]).as_py()
        split = (mid["min"] + mid["max"]) // 2
        mask = pc.less_equal(tbl["vec_id"], split)
        pq_.write_table(tbl.filter(mask), os.path.join(src, "emb-0.parquet"))
        info = run_pq_encode_cycle(spark, src, out, packed)
        # second half "lands" after the first cycle completed
        pq_.write_table(
            tbl.filter(pc.invert(mask)), os.path.join(src, "emb-1.parquet")
        )
        run_pq_encode_cycle(spark, src, out, packed)
        return (
            spark.read.parquet(info["sink_path"])
            .orderBy("vec_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


# the streaming sink must equal the batch PQ-code table exactly
STREAMING_PQ_CODES_SQL = PQ.EMBEDDING_PQ_CODES_SQL
