"""Native streaming session_window: the three-cycle watermark drain
must emit EVERY real session exactly once and agree with the batch
operators."""

import pytest


def test_matches_batch_session_window(spark, sf_dir):
    """Streaming (3-cycle drain) totals equal the batch session_window
    per-user rollup — same operator, same gap, different execution
    mode."""
    from oracledb_datapump_spark.operators.pipeline18 import (
        session_window_builtin,
    )
    from oracledb_datapump_spark.streaming.stateful import (
        streaming_session_window_native,
    )

    stream = streaming_session_window_native(spark, sf_dir).collect()
    per_user: dict = {}
    for r in stream:
        n, ev, longest, mx = per_user.get(r.user_id, (0, 0, 0, 0))
        span = r.session_end_us - r.session_start_us
        per_user[r.user_id] = (
            n + 1, ev + r.n_events, max(longest, span), max(mx, r.n_events)
        )
    batch = {r.user_id: r for r in session_window_builtin(spark, sf_dir).collect()}
    assert set(per_user) == set(batch)
    for u, (n, ev, longest, mx) in per_user.items():
        b = batch[u]
        assert (b.n_sessions, b.n_events, b.longest_us, b.max_events) == (
            n, ev, longest, mx
        )
    # no duplicate emissions: (user, start) unique
    keys = [(r.user_id, r.session_start_us) for r in stream]
    assert len(keys) == len(set(keys))
