"""Stateful streaming sessionizer (applyInPandasWithState): every closed
session must agree exactly with the batch window-function sessionizer; each
user's final session stays open in state (NoTimeout catch-up semantics)."""

import os
import shutil

from oracledb_datapump_spark.operators.analytics import events_sessionize
from oracledb_datapump_spark.streaming import stateful as S


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "a.parquet"))
    out = str(tmp_path / "sess_out")

    info = S.run_session_export(spark, src, out)
    got = spark.read.parquet(info["sink_path"])
    rows = got.collect()
    assert rows, "stream closed no sessions"
    assert all(r.closed_by == "gap" for r in rows)

    batch = events_sessionize(spark, sf_dir)
    b = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start_us, r.session_end_us)
        for r in batch.collect()
    }
    n_users = len({u for (u, _) in b})
    # closed = all batch sessions except each user's open last one
    assert len(rows) == len(b) - n_users
    mismatches = [
        r
        for r in rows
        if b.get((r.user_id, r.session_seq))
        != (r.n_events, r.session_start_us, r.session_end_us)
    ]
    assert not mismatches, mismatches[:3]

    # the open sessions are exactly each user's max seq
    emitted = {(r.user_id, r.session_seq) for r in rows}
    open_sessions = set(b) - emitted
    assert len(open_sessions) == n_users
    for user_id, seq in open_sessions:
        assert (user_id, seq + 1) not in b


def test_second_run_emits_nothing_new(spark, sf_dir, tmp_path):
    """Exactly-once: re-running the availableNow cycle with no new files
    must emit nothing (state + checkpoint resume)."""
    src = str(tmp_path / "src2")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src, "a.parquet"))
    out = str(tmp_path / "out2")
    info = S.run_session_export(spark, src, out)
    n1 = spark.read.parquet(info["sink_path"]).count()
    info = S.run_session_export(spark, src, out)
    n2 = spark.read.parquet(info["sink_path"]).count()
    assert n2 == n1
