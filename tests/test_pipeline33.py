"""Property tests for pipeline33 — Hilbert-curve correctness (the
operator's value rests on the curve being a real Hilbert curve, not
just on cross-engine agreement) and nprobe-curve monotonicity."""

from collections import defaultdict

from oracledb_datapump_spark.operators.pipeline33 import (
    NPROBE_SWEEP,
    ann_ivf_nprobe_curve,
    hilbert_column,
    hilbert_skip_compare,
    hilbert_steps,
)


def _xy2d_ref(n, x, y):
    """Independent canonical implementation (loops + ints)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _eval_steps(bits, x, y):
    """Replay the GENERATED step list in pure Python, reading the
    bit-plane constant out of each emitted d-expression — checks the
    emitter's step order and constants against the canonical loop."""
    import re

    env = {"hx": x, "hy": y, "hd": 0}
    n = 1 << bits
    for st in hilbert_steps("hx", "hy", "hd", bits):
        s_val = int(re.search(r"CAST\((\d+) AS BIGINT\)", st["hd"]).group(1))
        rx = 1 if (env["hx"] & s_val) > 0 else 0
        ry = 1 if (env["hy"] & s_val) > 0 else 0
        quad = (
            0 if (rx == 0 and ry == 0) else (1 if rx == 0 else (3 if ry == 0 else 2))
        )
        nxt = dict(env)
        nxt["hd"] = env["hd"] + s_val * s_val * quad
        if ry == 0:
            fx = (n - 1 - env["hx"]) if rx == 1 else env["hx"]
            fy = (n - 1 - env["hy"]) if rx == 1 else env["hy"]
            nxt["hx"], nxt["hy"] = fy, fx
        env = nxt
    return env["hd"]


def test_hilbert_steps_match_canonical():
    bits = 8
    n = 1 << bits
    for x in range(0, n, 17):
        for y in range(0, n, 13):
            assert _eval_steps(bits, x, y) == _xy2d_ref(n, x, y)


def test_hilbert_column_bijective_and_local(spark):
    bits = 6
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "qx long, qy long"
    )
    rows = hilbert_column(grid, "qx", "qy", bits).collect()
    d2xy = {r["__h"]: (r.qx, r.qy) for r in rows}
    assert len(d2xy) == n * n  # bijective
    assert min(d2xy) == 0 and max(d2xy) == n * n - 1
    bad = sum(
        1
        for d in range(n * n - 1)
        if abs(d2xy[d][0] - d2xy[d + 1][0]) + abs(d2xy[d][1] - d2xy[d + 1][1])
        != 1
    )
    assert bad == 0  # perfect unit locality — the Hilbert property


def test_hilbert_beats_or_ties_zorder_on_both(spark, sf_dir):
    rows = {(r.layout, r.workload): r for r in hilbert_skip_compare(spark, sf_dir).collect()}
    assert set(l for l, _ in rows) == {"zorder", "hilbert"}
    for layout, wl in rows:
        r = rows[(layout, wl)]
        assert 0 <= r.n_groups_scanned <= r.n_groups
    # identical group budgets: both layouts split the same row count
    assert rows[("hilbert", "both")].n_groups == rows[("zorder", "both")].n_groups


def test_nprobe_curve_candidate_monotone_topk_bounded(spark, sf_dir):
    rows = ann_ivf_nprobe_curve(spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == list(NPROBE_SWEEP)
    cand = [r.cand_recall_ppm for r in rows]
    # probing a superset of clusters can only ADD candidates
    assert all(a <= b for a, b in zip(cand, cand[1:])), cand
    for r in rows:
        # a top-k hit must first be a candidate (displacement only loses)
        assert 0 <= r.topk_hits <= r.cand_hits
        assert 0 <= r.topk_recall_ppm <= r.cand_recall_ppm <= 1_000_000
