"""Property-style tests for composite operators: the as-of join against
a naive bisect reference over random inputs, and the shard planner's
balance invariants over the real fixture."""

import bisect
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from oracledb_datapump_spark.operators.temporal import asof_join


def test_asof_join_random_matches_bisect(spark):
    """Randomized (seeded) left/right streams across shared keys: the
    window-composed as-of join must agree with a per-row bisect over the
    sorted right side — inclusive match, latest-at-tie, null when no
    prior right row."""
    rng = random.Random(42)
    keys = ["a", "b", "c", "d"]
    # unique (k, rt) pairs: the operator leaves the winner among
    # right rows tied on (key, ts) unspecified (window orders by
    # (__ts, __tag) only), so the reference must not depend on one
    seen = set()
    right = []
    while len(right) < 60:
        k, rt = rng.choice(keys), rng.randint(0, 100)
        if (k, rt) not in seen:
            seen.add((k, rt))
            right.append(Row(k=k, rt=rt, val=len(right)))
    left = [
        Row(k=rng.choice(keys), t=rng.randint(0, 100), lid=i) for i in range(80)
    ]
    out = {
        r.lid: r.val
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            by="k",
            ts_left="t",
            ts_right="rt",
            carry=["val"],
        ).collect()
    }
    # reference: per key, sorted by rt (unique per key by
    # construction); match = last row with rt <= t
    by_key: dict = {}
    for r in sorted(right, key=lambda r: (r.rt, r.val)):
        by_key.setdefault(r.k, []).append((r.rt, r.val))
    for r in left:
        lst = by_key.get(r.k, [])
        i = bisect.bisect_right(lst, (r.t, float("inf"))) - 1
        expect = lst[i][1] if i >= 0 else None
        assert out[r.lid] == expect, (r.lid, r.k, r.t, out[r.lid], expect)


def test_shard_plan_balance_invariants(spark, sf_dir):
    """LPT round-robin invariants: every shard's doc count differs by at
    most 1; every shard's token total differs from any other by at most
    the largest single document; shard ids cover exactly 0..N-1."""
    from oracledb_datapump_spark.operators.evaluation import (
        N_SHARDS,
        corpus_shard_plan,
    )

    rows = corpus_shard_plan(spark, sf_dir).collect()
    assert rows
    docs: dict = {}
    toks: dict = {}
    for r in rows:
        docs[r.shard] = docs.get(r.shard, 0) + 1
        toks[r.shard] = toks.get(r.shard, 0) + r.bpe_ish_tokens
    assert set(docs) == set(range(N_SHARDS))
    assert max(docs.values()) - min(docs.values()) <= 1
    max_doc = max(r.bpe_ish_tokens for r in rows)
    assert max(toks.values()) - min(toks.values()) <= max_doc


def test_doc_chunks_cover_and_overlap(spark, sf_dir):
    """Chunk windows tile each document: starts advance by the stride,
    the final chunk reaches the last token, and every chunk except the
    last is full-width."""
    from oracledb_datapump_spark.operators.evaluation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunks,
    )
    from oracledb_datapump_spark.functions.text import tokens

    chunks: dict = {}
    for r in doc_chunks(spark, sf_dir).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    n_toks = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(tokens("text")).alias("n"))
        .collect()
    }
    assert chunks
    for doc_id, cs in chunks.items():
        cs.sort(key=lambda r: r.chunk_idx)
        n = n_toks[doc_id]
        for i, c in enumerate(cs):
            assert c.chunk_start == i * CHUNK_STRIDE
            expect_len = min(CHUNK_TOKENS, n - c.chunk_start)
            assert c.n_tokens_chunk == expect_len
        # last window reaches the end of the document
        last = cs[-1]
        assert last.chunk_start + last.n_tokens_chunk == n
        # and no extra window would start in-bounds
        assert last.chunk_start + CHUNK_STRIDE >= n
    # zero-token docs emit nothing
    assert set(chunks) == {d for d, n in n_toks.items() if n > 0}
