"""Property tests for pipeline32 — independent references formulated
differently from both the operator and its gated oracle."""

import math
import re
from collections import defaultdict

import pyarrow.parquet as pq

from oracledb_datapump_spark.operators.pipeline32 import (
    CHURN_HOLDOUT_DAYS,
    CHURN_WINDOW_DAYS,
    DAY_US,
    NEG_VOCAB,
    churn_training_set,
    skipgram_negative_table,
    user_longest_streak,
)


def test_skipgram_table_python_reference(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).to_pydict()
    freq = defaultdict(int)
    for text in t["text"]:
        for w in re.split("[^a-z]+", text.lower()):
            if len(w) >= 2:
                freq[w] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:NEG_VOCAB]
    rows = skipgram_negative_table(spark, sf_dir).collect()
    assert [(r.token, r.freq) for r in rows] == top
    cum = 0
    for r in rows:
        w = math.isqrt(math.isqrt(r.freq**3))
        assert r.weight == w
        cum += w
        assert r.cum_weight == cum
    # ^0.75 smoothing flattens: weight ratios compress vs freq ratios
    if len(rows) >= 2 and rows[-1].freq < rows[0].freq:
        assert (
            rows[0].weight / rows[-1].weight
            < rows[0].freq / rows[-1].freq
        )


def test_streaks_python_reference(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).to_pydict()
    days = defaultdict(set)
    for u, ts in zip(t["user_id"], t["ts"]):
        days[u].add(int(ts.timestamp() * 1_000_000) // (DAY_US // 1))
    got = {r.user_id: r for r in user_longest_streak(spark, sf_dir).collect()}
    assert set(got) == set(days)
    for u, ds in days.items():
        ds = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        r = got[u]
        assert r.n_active_days == len(ds)
        assert r.n_islands == len(runs)
        assert r.longest_streak == max(runs)


def test_churn_labels_python_reference(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    per_user = defaultdict(list)
    for u, ts, et in zip(t["user_id"], t["ts"], t["event_type"]):
        per_user[u].append((int(ts.timestamp() * 1_000_000) // DAY_US, et))
    max_day = max(d for evs in per_user.values() for d, _ in evs)
    cutoff = max_day - CHURN_HOLDOUT_DAYS
    lo = cutoff - CHURN_WINDOW_DAYS
    got = {r.user_id: r for r in churn_training_set(spark, sf_dir).collect()}
    for u, evs in per_user.items():
        obs = [d for d, _ in evs if d <= cutoff]
        if not obs:
            assert u not in got
            continue
        r = got[u]
        assert r.n_events_window == sum(1 for d, _ in evs if lo < d <= cutoff)
        assert r.n_purchases_window == sum(
            1 for d, e in evs if lo < d <= cutoff and e == "purchase"
        )
        assert r.recency_days == cutoff - max(obs)
        assert r.churned == (max(d for d, _ in evs) <= cutoff)
    # the dataset must contain at least one of each label to be trainable
    labels = {r.churned for r in got.values()}
    assert len(got) > 0
