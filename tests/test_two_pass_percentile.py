"""Histogram-refinement order statistics (pipeline38): the refinement
must land on the classical rank value for DEGENERATE distributions the
fixture never exercises — constant groups (span 1, one bucket),
singletons, heavy ties straddling bucket edges, and one-bucket skew.
Truth is computed in plain Python (sorted()[ceil(n·pct/100)-1])."""

import random

from oracledb_datapump_spark.operators.pipeline38 import (
    order_stats_two_pass,
)


def _truth(groups: dict[str, list[int]], pcts):
    out = {}
    for g, vs in groups.items():
        s = sorted(vs)
        for pct in pcts:
            rank = max(1, (len(s) * pct + 99) // 100)
            out[(g, pct)] = (len(s), s[rank - 1])
    return out


def _run(spark, groups: dict[str, list[int]], pcts=(50, 90)):
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r.grp, r.pct): (r.n_rows, r.value_cents)
        for r in order_stats_two_pass(spark, df, pcts).collect()
    }
    assert got == _truth(groups, pcts), (got, _truth(groups, pcts))


def test_constant_group_and_singleton(spark):
    _run(spark, {"const": [7] * 100, "single": [42], "two": [1, 2]})


def test_heavy_ties_and_negatives(spark):
    _run(
        spark,
        {
            "ties": [5] * 60 + [9] * 40,
            "neg": [-100] * 10 + [0] * 10 + [100] * 10,
        },
        pcts=(10, 50, 90, 100),
    )


def test_one_bucket_skew(spark):
    # 99% of mass in one value at the low edge, a huge outlier stretches
    # the envelope so nearly everything lands in bucket 0
    _run(spark, {"skew": [3] * 990 + [10_000_000_000] * 10})


def test_random_groups_match_classical(spark):
    rng = random.Random(11)
    groups = {
        f"g{i}": [rng.randint(-1000, 1000) for _ in range(rng.randint(1, 400))]
        for i in range(6)
    }
    _run(spark, groups, pcts=(1, 25, 50, 75, 99))
