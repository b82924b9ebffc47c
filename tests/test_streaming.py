"""Streaming pins: oracle parity is covered by check_oracles; these tests
exercise the watermark + append path (the at-scale posture) that the
registry entries cannot use, because append never emits unclosed windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_graph_database_simulation_spark.streaming import windowed


def test_append_with_watermark_emits_closed_windows_only(spark, sf_dir):
    ev = windowed._events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("hour"), "event_type", "n_events")
    )
    appended = windowed._run_bounded(agg, spark, "wm_append_test", "append")
    complete = windowed.stream_events_hourly(spark, sf_dir).select(
        "hour", "event_type", "n_events"
    )
    a = {(r.hour, r.event_type): r.n_events for r in appended.collect()}
    c = {(r.hour, r.event_type): r.n_events for r in complete.collect()}
    # every emitted window is final and matches the complete answer
    assert a, "append mode emitted nothing"
    for k, v in a.items():
        assert c[k] == v
    # only windows near the max event time may be withheld by the watermark
    max_hour = max(h for h, _ in c)
    withheld = {h for (h, _) in set(c) - set(a)}
    assert all((max_hour - h).total_seconds() <= 3 * 3600 for h in withheld)


def test_streaming_session_window_matches_batch_sessionization(spark, sf_dir):
    """session_window(streaming) must agree with the batch gap-and-islands
    session count per user (rel_event_sessions)."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        event_sessions,
    )

    stream_sessions = windowed.stream_user_sessions(spark, sf_dir)
    per_user_stream = {
        r.user_id: r.n
        for r in stream_sessions.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    per_user_batch = {
        r.user_id: r.n_sessions for r in event_sessions(spark, sf_dir).collect()
    }
    assert per_user_stream == per_user_batch
