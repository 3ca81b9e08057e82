"""Batch 45: planning/release operators — LSH band planner, fixed-point
weighted sampling, geometric-mechanism DP release, leakage quarantine,
source entropy, context fill curve. Each test plants a fixture whose
expected output is hand-derivable (the hash-keyed ones recompute the
md5-based hash in pure Python), plus a DuckDB oracle match."""

import hashlib
from fractions import Fraction

import duckdb
import pytest

from oracledb_datapump_spark.operators import pipeline45 as P45


def h64(s: str) -> int:
    """Python twin of functions.text.hash64."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.sql(sql).fetchall()


# ---------------------------------------------------------------------------
# lsh_band_planner
# ---------------------------------------------------------------------------


def test_scurve_rows_exact_closed_form():
    rows = {(s, b, r, sp): v for s, b, r, sp, v in P45._scurve_rows()}
    # (4,4) banding at s=0.5: p = 1-(1-1/16)^4 exactly
    p = 1 - (1 - Fraction(1, 2) ** 4) ** 4
    assert rows[("scurve", 4, 4, 500_000)] == int(p * 1_000_000)
    # single band of 16 rows at s=0.95: p = 0.95^16
    p1 = Fraction(19, 20) ** 16
    assert rows[("scurve", 1, 16, 950_000)] == int(p1 * 1_000_000)
    # 16 bands of 1 row: strictly the most permissive at every s
    for sp in range(50_000, 1_000_000, 50_000):
        assert rows[("scurve", 16, 1, sp)] >= rows[("scurve", 1, 16, sp)]


def test_planner_empirical_planted_pair(spark, tmp_path):
    """Two identical docs collide in EVERY banding; the permissive
    (16,1) banding counts at least as many candidates as (1,16)."""
    text = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"x{i}" for i in range(40))
    sf = write_docs(
        spark,
        tmp_path,
        [(1, text, "en", "a", 1), (2, text, "en", "a", 1), (3, other, "en", "b", 1)],
    )
    out = P45.lsh_band_planner(spark, sf).collect()
    cand = {(r.b, r.r): r.val for r in out if r.section == "candidates"}
    assert set(cand) == {(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)}
    assert all(v >= 1 for v in cand.values())
    assert cand[(16, 1)] >= cand[(1, 16)]
    assert oracle(sf, P45.LSH_BAND_PLANNER_SQL) is not None


def test_planner_matches_oracle(spark, tmp_path):
    text = " ".join(f"t{i % 7}" for i in range(30))
    sf = write_docs(
        spark,
        tmp_path,
        [(i, text if i % 2 else text + " tail", "en", f"s{i % 3}", 1) for i in range(6)],
    )
    got = sorted(map(tuple, P45.lsh_band_planner(spark, sf).collect()))
    want = sorted(map(tuple, oracle(sf, P45.LSH_BAND_PLANNER_SQL)))
    assert got == want


# ---------------------------------------------------------------------------
# weighted_sample_report
# ---------------------------------------------------------------------------


def test_weighted_sample_bottom_k_by_fixed_point_priority(spark, tmp_path):
    """150 docs, K=100: the sampled set is exactly the bottom-K of
    hash64('ws:'||id) div chars, recomputed in pure Python."""
    rows = [
        (i, "body", "en", f"src{i % 3}", (i % 10) * 37 + 1) for i in range(150)
    ]
    sf = write_docs(spark, tmp_path, rows)
    pri = sorted(
        (h64(f"ws:{i}") // max(w, 1), i) for i, _, _, _, w in rows
    )
    winners = {i for _, i in pri[: P45.SAMPLE_K]}
    want = {}
    for i, _, _, src, w in rows:
        n, s, c = want.get(src, (0, 0, 0))
        hit = i in winners
        want[src] = (n + 1, s + hit, c + (w if hit else 0))
    got = {
        r.source: (r.n_docs, r.n_sampled, r.chars_sampled)
        for r in P45.weighted_sample_report(spark, sf).collect()
    }
    assert got == want
    duck = {
        s: (a, b, c) for s, a, b, c in oracle(sf, P45.WEIGHTED_SAMPLE_REPORT_SQL)
    }
    assert duck == want


def test_weighted_sample_small_corpus_takes_everything(spark, tmp_path):
    sf = write_docs(
        spark, tmp_path, [(i, "x", "en", "only", 5) for i in range(7)]
    )
    [row] = P45.weighted_sample_report(spark, sf).collect()
    assert (row.n_docs, row.n_sampled, row.chars_sampled) == (7, 7, 35)


# ---------------------------------------------------------------------------
# dp_release_counts
# ---------------------------------------------------------------------------


def geo_noise(key: str) -> int:
    """Python twin of the bit-ladder: sign from the lowest hash bit,
    magnitude = index of first zero bit of h//2 (clamped at 16)."""
    h = h64(key)
    sign = 1 - (h % 2) * 2
    g = h // 2
    k = P45._GEO_LEVELS
    for bit in range(P45._GEO_LEVELS):
        if (g >> bit) % 2 == 0:
            k = bit
            break
    return sign * k


def test_dp_release_matches_python_mechanism(spark, tmp_path):
    rows = []
    doc = 0
    truth = {}
    for src, lang, n in [("a", "en", 50), ("a", "fr", 3), ("b", "en", 12)]:
        truth[(src, lang)] = n
        for _ in range(n):
            rows.append((doc, "t", lang, src, 1))
            doc += 1
    sf = write_docs(spark, tmp_path, rows)
    out = {
        (r.source, r.lang): (r.released, r.suppressed)
        for r in P45.dp_release_counts(spark, sf).collect()
    }
    for (src, lang), n in truth.items():
        rel = max(n + geo_noise(f"dp:{src}|{lang}"), 0)
        sup = rel < P45.DP_SUPPRESS_BELOW
        assert out[(src, lang)] == (0 if sup else rel, sup)
    duck = {
        (s, l): (r, sup) for s, l, r, sup in oracle(sf, P45.DP_RELEASE_COUNTS_SQL)
    }
    assert duck == out


def test_dp_noise_distribution_shape():
    """Over many keys the geometric ladder produces magnitude k with
    frequency ~2^-(k+1): magnitude 0 must dominate and the clamp must
    be rare."""
    mags = [abs(geo_noise(f"dp:probe{i}")) for i in range(4096)]
    assert mags.count(0) > 4096 * 0.4
    assert mags.count(P45._GEO_LEVELS) <= 2


# ---------------------------------------------------------------------------
# leakage_quarantine_plan
# ---------------------------------------------------------------------------


def split_of(doc_id: int) -> str:
    b = h64(f"split:{doc_id}") % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def pick_id(split: str, start: int) -> int:
    i = start
    while split_of(i) != split:
        i += 1
    return i


def test_quarantine_sheds_the_eval_side(spark, tmp_path):
    """A train×test near-dup pair quarantines the TEST doc; a
    train×train pair quarantines nothing."""
    t1 = pick_id("train", 0)
    t2 = pick_id("train", t1 + 1)
    te = pick_id("test", 0)
    dup = " ".join(f"d{i}" for i in range(30))
    other = " ".join(f"o{i}" for i in range(30))
    rows = [
        (t1, dup, "en", "sA", 1),
        (te, dup, "en", "sB", 1),
        (t2, other, "en", "sA", 1),
        (pick_id("train", t2 + 1), other, "en", "sA", 1),
    ]
    sf = write_docs(spark, tmp_path, rows)
    out = {
        (r.split, r.source): (r.n_docs, r.n_quarantined)
        for r in P45.leakage_quarantine_plan(spark, sf).collect()
    }
    assert out[("test", "sB")] == (1, 1)  # the eval side is shed
    assert out[("train", "sA")][1] == 0  # train keeps everything
    duck = {
        (sp, so): (n, q)
        for sp, so, n, q in oracle(sf, P45.LEAKAGE_QUARANTINE_PLAN_SQL)
    }
    assert duck == out


# ---------------------------------------------------------------------------
# source_token_entropy
# ---------------------------------------------------------------------------


def test_entropy_proxy_hand_computed(spark, tmp_path):
    """'a a b' → N=3 (bitlen 2), c={a:2 (bitlen 2), b:1 (bitlen 1)}:
    proxy = 3·2 − (2·2 + 1·1) = 1; ttr = 2e6 // 3."""
    sf = write_docs(spark, tmp_path, [(1, "a a b", "en", "s", 5)])
    [row] = P45.source_token_entropy(spark, sf).collect()
    assert (row.n_tokens, row.n_types, row.ttr_ppm, row.entropy_proxy) == (
        3,
        2,
        666_666,
        1,
    )
    assert oracle(sf, P45.SOURCE_TOKEN_ENTROPY_SQL) == [("s", 3, 2, 666_666, 1)]


def test_entropy_zero_for_single_type(spark, tmp_path):
    sf = write_docs(spark, tmp_path, [(1, "z z z z", "en", "mono", 7)])
    [row] = P45.source_token_entropy(spark, sf).collect()
    assert row.entropy_proxy == 0 and row.n_types == 1


# ---------------------------------------------------------------------------
# context_fill_curve
# ---------------------------------------------------------------------------


def test_fill_curve_hand_computed(spark, tmp_path):
    """600 tokens: W=512 → 2 windows, fill = 600e6 // 1024;
    W=1024 → 1 window, fill = 600e6 // 1024 (same ratio, different
    window count); an empty doc burns exactly one padding-only window."""
    text = " ".join(f"w{i}" for i in range(600))
    sf = write_docs(
        spark, tmp_path, [(1, text, "en", "s", 1), (2, "", "en", "pad", 0)]
    )
    out = {
        (r.w, r.source): (r.n_docs, r.n_windows, r.fill_ppm)
        for r in P45.context_fill_curve(spark, sf).collect()
    }
    assert out[(512, "s")] == (1, 2, 600 * 1_000_000 // (2 * 512))
    assert out[(1024, "s")] == (1, 1, 600 * 1_000_000 // 1024)
    for w in P45.WINDOW_SIZES:
        assert out[(w, "pad")] == (1, 1, 0)
    duck = {
        (w, s): (a, b, c)
        for w, s, a, b, c in oracle(sf, P45.CONTEXT_FILL_CURVE_SQL)
    }
    assert duck == out
