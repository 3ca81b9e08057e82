"""Property tests for pipeline31 — independent references formulated
differently from both the operator and its gated oracle."""

import math
from collections import defaultdict

import pyarrow.parquet as pq

from oracledb_datapump_spark.operators.pipeline31 import (
    BPE_TOP,
    CENTROID_Q,
    FUNNEL_STEP_GAP_US,
    FUNNEL_STEPS,
    bpe_merge_candidates,
    funnel_ordered_within_gap,
    label_centroid_similarity,
)


def test_funnel_python_reference(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    per_user = defaultdict(list)
    for u, ts, et in zip(t["user_id"], t["ts"], t["event_type"]):
        per_user[u].append((int(ts.timestamp() * 1_000_000), et))
    c1 = c2 = c3 = within = 0
    for evs in per_user.values():
        evs.sort()
        t1 = min((us for us, et in evs if et == FUNNEL_STEPS[0]), default=None)
        if t1 is None:
            continue
        c1 += 1
        t2 = min(
            (us for us, et in evs if et == FUNNEL_STEPS[1] and us > t1),
            default=None,
        )
        if t2 is None:
            continue
        c2 += 1
        t3 = min(
            (us for us, et in evs if et == FUNNEL_STEPS[2] and us > t2),
            default=None,
        )
        if t3 is None:
            continue
        c3 += 1
        if t2 - t1 <= FUNNEL_STEP_GAP_US and t3 - t2 <= FUNNEL_STEP_GAP_US:
            within += 1
    r = funnel_ordered_within_gap(spark, sf_dir).collect()[0]
    assert (r.n_users, r.reached_view, r.reached_click,
            r.reached_purchase, r.completed_within_gap) == (
        len(per_user), c1, c2, c3, within
    )
    assert r.n_users >= r.reached_view >= r.reached_click >= r.reached_purchase
    assert r.completed_within_gap <= r.reached_purchase


def test_centroid_similarity_python_reference(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    sums = defaultdict(lambda: defaultdict(int))
    cnts = defaultdict(int)
    for lab, vec in zip(t["label"], t["embedding"]):
        cnts[lab] += 1
        for i, x in enumerate(vec):
            sums[lab][i] += math.floor(float(x) * CENTROID_Q)

    def idiv(a, b):  # truncating signed integer division (both engines)
        return -((-a) // b) if a < 0 else a // b

    cent = {
        lab: [idiv(sums[lab][i], cnts[lab]) for i in range(len(sums[lab]))]
        for lab in sums
    }
    nrm = {
        lab: math.isqrt(sum(c * c for c in v)) for lab, v in cent.items()
    }
    got = {
        (r.label_a, r.label_b): r.cos_ppm
        for r in label_centroid_similarity(spark, sf_dir).collect()
    }
    labs = sorted(cent)
    assert len(got) == len(labs) * (len(labs) - 1) // 2
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            dot = sum(x * y for x, y in zip(cent[a], cent[b]))
            assert got[(a, b)] == idiv(dot * 1_000_000, nrm[a] * nrm[b])


def test_bpe_candidates_python_reference(spark, sf_dir):
    import re

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).to_pydict()
    freq = defaultdict(int)
    for text in t["text"]:
        for w in re.split("[^a-z]+", text.lower()):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    freq[w[i : i + 2]] += 1
    expect = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP]
    got = bpe_merge_candidates(spark, sf_dir).collect()
    assert [(r.pair, r.freq) for r in got] == expect
    assert [r.rnk for r in got] == list(range(1, len(expect) + 1))


def test_bpe_double_space_merge_semantics(spark):
    """The double-space boundary representation makes literal replace
    exactly greedy non-overlapping BPE: consecutive disjoint pair sites
    ALL merge in one pass ('abab' -> 'ab ab'), overlapping sites merge
    left-to-right only ('aaa' -> 'aa a'), and multi-char tokens never
    false-match inside other tokens."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(" a  b  a  b ",), (" a  a  a ",), (" xa  b ",)], "seq string"
    )
    out = [
        r["m"]
        for r in df.select(
            F.replace(F.col("seq"), F.lit(" a  b "), F.lit(" ab ")).alias("m")
        ).collect()
    ]
    assert out[0] == " ab  ab "   # both disjoint sites merged
    assert out[1] == " a  a  a "  # pair (a,b) absent — untouched
    assert out[2] == " xa  b "    # 'xa' does not false-match 'a'
    out2 = [
        r["m"]
        for r in df.select(
            F.replace(F.col("seq"), F.lit(" a  a "), F.lit(" aa ")).alias("m")
        ).collect()
    ]
    assert out2[1] == " aa  a "   # greedy left-to-right, no rescan
    # DuckDB replace agrees on all of it (the cross-engine contract)
    import duckdb

    con = duckdb.connect()
    for seq, pat, rep, want in [
        (" a  b  a  b ", " a  b ", " ab ", " ab  ab "),
        (" a  a  a ", " a  a ", " aa ", " aa  a "),
        (" xa  b ", " a  b ", " ab ", " xa  b "),
    ]:
        got = con.sql(
            "SELECT replace(?, ?, ?)", params=[seq, pat, rep]
        ).fetchone()[0]
        assert got == want, (seq, got)


def test_bpe_encode_curve_monotone(spark, sf_dir):
    from oracledb_datapump_spark.operators.pipeline31 import (
        BPE_CURVE_K,
        bpe_encode_curve,
    )

    rows = bpe_encode_curve(spark, sf_dir).collect()
    assert rows[0]["k"] == 0 and rows[0]["merged_pair"] == ""
    assert len(rows) == BPE_CURVE_K + 1
    toks = [r["total_tokens"] for r in rows]
    ferts = [r["fertility_ppm"] for r in rows]
    # every merge strictly reduces the corpus token count
    assert all(a > b for a, b in zip(toks, toks[1:]))
    assert all(a >= b for a, b in zip(ferts, ferts[1:]))
    # merged pairs are distinct (a pair can win at most one round)
    pairs = [r["merged_pair"] for r in rows[1:]]
    assert len(set(pairs)) == len(pairs)
