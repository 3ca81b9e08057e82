"""Property tests for the pipeline23 operators — independent references
formulated differently from both the operator and its gated oracle."""

import math
import re
from collections import defaultdict

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline23 as PL23
from oracledb_datapump_spark.operators.pipeline23 import (
    dedup_transitivity_audit,
    quantization_error_curve,
    truncation_loss_curve,
)


@pytest.fixture(scope="module")
def duck_raw(sf_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_quantization_python_reference_and_monotone(spark, sf_dir, duck_raw):
    """Python replay over the raw coordinates reproduces every arm, and
    error is non-increasing in bit width (more bits never hurt)."""
    vals = [
        math.floor(x * PL23.QUANT_SCALE)
        for (x,) in duck_raw.sql(
            "SELECT unnest(embedding) FROM embeddings"
        ).fetchall()
    ]
    A = max(abs(v) for v in vals)
    got = sorted(
        quantization_error_curve(spark, sf_dir).collect(),
        key=lambda r: r.bits,
    )
    assert [r.bits for r in got] == sorted(PL23.QUANT_BITS)
    prev_mean = None
    for r in got:
        levels = (1 << (r.bits - 1)) - 1
        step = A // levels + 1
        errs = [abs(v) % step for v in vals]
        assert r.n_values == len(vals)
        assert r.step == step
        assert r.mean_abs_err_micro == sum(errs) // len(errs)
        assert r.max_abs_err_micro == max(errs)
        assert r.max_abs_err_micro < step
        if prev_mean is not None:
            assert r.mean_abs_err_micro <= prev_mean
        prev_mean = r.mean_abs_err_micro


def test_truncation_python_reference_and_monotone(spark, sf_dir, duck_raw):
    """Python tokenizer replay reproduces the curve; loss is
    non-increasing in the limit."""
    docs = duck_raw.sql("SELECT text FROM documents").fetchall()
    nts = [
        sum(1 for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
        for (text,) in docs
    ]
    tot = sum(nts)
    got = sorted(
        truncation_loss_curve(spark, sf_dir).collect(),
        key=lambda r: r.limit_tokens,
    )
    assert [r.limit_tokens for r in got] == sorted(PL23.TRUNC_LIMITS)
    prev_lost = None
    for r in got:
        L = r.limit_tokens
        over = sum(1 for n in nts if n > L)
        lost = sum(n - L for n in nts if n > L)
        assert (r.n_docs_over, r.tokens_lost) == (over, lost)
        assert r.lost_ppm == lost * 1_000_000 // max(tot, 1)
        if prev_lost is not None:
            assert r.tokens_lost <= prev_lost
        prev_lost = r.tokens_lost


def test_transitivity_python_reference(spark, sf_dir):
    """Python adjacency replay over the verified pair list reproduces
    wedge/closure counts; every triangle closes three wedges."""
    from oracledb_datapump_spark.operators.dedup import verified_pairs_cached

    pairs = {
        (r.doc_a, r.doc_b)
        for r in verified_pairs_cached(spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    n_wedges = n_closed = 0
    for b, nbrs in adj.items():
        ns = sorted(nbrs)
        for i, a in enumerate(ns):
            for c in ns[i + 1 :]:
                n_wedges += 1
                if (min(a, c), max(a, c)) in pairs:
                    n_closed += 1
    r = dedup_transitivity_audit(spark, sf_dir).collect()[0]
    assert r.n_edges == len(pairs)
    assert (r.n_wedges, r.n_closed) == (n_wedges, n_closed)
    assert r.open_ppm == (n_wedges - n_closed) * 1_000_000 // max(n_wedges, 1)
