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


def test_stateful_totals_multibatch_with_negative_values(spark, tmp_path):
    """Two forced micro-batches whose second batch DECREASES sum_value for
    every user: the final-emission reduction must pair (n_events, sum_value)
    atomically (max_by), not take independent maxima — an independent
    max(sum_value) would resurrect the batch-1 partial sum here."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    batch1 = [(1, ts, 7, 10.5), (2, ts, 7, 2.25), (3, ts, 8, -1.0)]
    batch2 = [(4, ts, 7, -20.0), (5, ts, 8, -3.5)]
    src = str(tmp_path / "stream_src")
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    raw = windowed._run_bounded(
        windowed._stateful_user_totals(stream), spark, "stateful_neg_test", "update"
    )
    # multi-batch actually happened: user 7 emitted a running total twice
    assert raw.where("user_id = 7").count() == 2
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in windowed._final_user_totals(raw).collect()
    }
    assert got == {7: (3, -7.25), 8: (2, -4.5)}


def test_events_stream_handles_directory_form(spark, sf_dir, tmp_path):
    """If the driver ever ships events.parquet as a DIRECTORY of part files
    (standard Spark writer output), the leaf-name glob would match nothing
    and silently stream zero rows; the source must detect the directory
    form and stream it directly, producing the identical answer."""
    import os
    import shutil

    mirror = str(tmp_path / "sf_mirror")
    os.makedirs(mirror)
    for f in os.listdir(sf_dir):
        src = os.path.join(sf_dir, f)
        if f != "events.parquet" and os.path.isfile(src):
            shutil.copy(src, os.path.join(mirror, f))
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).repartition(
        2
    ).write.parquet(os.path.join(mirror, "events.parquet"))
    n_dir = windowed.stream_events_hourly(spark, mirror).count()
    n_file = windowed.stream_events_hourly(spark, sf_dir).count()
    assert n_dir == n_file > 0


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


def test_file_sink_checkpoint_recovery_no_duplicate_windows(spark, tmp_path):
    """The production sink path: append-mode windowed agg -> parquet file
    sink with a checkpointLocation, stopped and restarted twice as new
    source files land. Across restarts every emitted window must appear
    exactly once (checkpoint recovery must not re-emit), and every emitted
    count must equal the batch ground truth over the same data."""
    import datetime

    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, hours):
        return (i, base + datetime.timedelta(hours=hours), i % 3, 1.0)

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    batches = [
        [ev(1, 0.2), ev(2, 0.5), ev(3, 1.1), ev(4, 5.0)],
        [ev(5, 6.0), ev(6, 9.0)],
        [ev(7, 12.0)],
    ]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("hour"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    all_rows = []
    for rows in batches:
        all_rows += rows
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_once()

    emitted = spark.read.parquet(sink).collect()
    # exactly-once: no window appears twice across the three runs
    hours = [r.hour for r in emitted]
    assert len(hours) == len(set(hours)), f"duplicate windows emitted: {hours}"
    # the early windows are certainly closed by the final 12h watermark
    assert {h.hour for h in hours} >= {0, 1, 5}
    # every emitted value equals the batch ground truth
    truth = {}
    for _, ts, _, _ in all_rows:
        truth[ts.replace(minute=0, second=0)] = (
            truth.get(ts.replace(minute=0, second=0), 0) + 1
        )
    for r in emitted:
        assert truth[r.hour] == r.n, (r.hour, r.n, truth)


def test_stream_dedup_ingest_matches_one_shot(spark, sf_dir, tmp_path):
    """Continuous dedup ingestion: two micro-batches through the
    foreachBatch sink must (a) produce exactly the one-shot pair set over
    the full corpus (batch-1 pairs in partition 0, cross/new pairs in
    partition 1), and (b) be idempotent under batch replay."""
    from distributed_graph_database_simulation_spark.operators import dedup
    from distributed_graph_database_simulation_spark.streaming.ingest import (
        dedup_ingest_batch,
        stream_dedup_ingest,
    )

    docs = dedup._docs(spark, sf_dir).select("doc_id", "text")
    split = 250
    feed = str(tmp_path / "feed")
    docs.where(F.col("doc_id") < split).coalesce(1).write.parquet(f"{feed}/b0")
    docs.where(F.col("doc_id") >= split).coalesce(1).write.parquet(f"{feed}/b1")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/*")
    )
    store = str(tmp_path / "store")
    pairs_path = str(tmp_path / "pairs")
    q = stream_dedup_ingest(
        spark, stream, store, pairs_path, str(tmp_path / "ck")
    )
    q.awaitTermination(300)

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_path).collect()
    }
    expected = {
        (r.doc_a, r.doc_b, r.jaccard) for r in dedup.minhash_lsh_df(docs).collect()
    }
    assert got == expected
    assert got, "corpus is expected to contain near-dup pairs"

    # replaying a batch (same batch_id) must leave pairs AND store unchanged
    n_bands_before = spark.read.parquet(f"{store}/bands").count()
    replay = spark.read.parquet(f"{feed}/b1")
    dedup_ingest_batch(spark, replay, 1, store, pairs_path)
    got_after = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_path).collect()
    }
    assert got_after == expected
    assert spark.read.parquet(f"{store}/bands").count() == n_bands_before


def test_stream_sketch_ingest_merges_to_batch_truth(spark, sf_dir, tmp_path):
    """Two event micro-batches through the sketch sink: merged HLL
    distinct estimates must equal what one-shot sketches over the full
    table give, KLL quantile estimates must sit within the rank-error
    envelope of truth (checked via true rank), and n must be exact."""
    from distributed_graph_database_simulation_spark.operators import pipeline
    from distributed_graph_database_simulation_spark.sources.tables import load_table
    from distributed_graph_database_simulation_spark.streaming.ingest import (
        stream_sketch_ingest,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    feed = str(tmp_path / "feed")
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{feed}/b0")
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{feed}/b1")
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/*")
    )
    store = str(tmp_path / "sketches")
    q = stream_sketch_ingest(
        spark, stream, "user_id", "value", "event_type", store, str(tmp_path / "ck")
    )
    q.awaitTermination(300)

    assert {
        r.batch_id for r in spark.read.parquet(f"{store}/hll").select("batch_id").collect()
    } == {0, 1}
    merged = {
        r.group_key: r.n_distinct_estimate
        for r in pipeline.read_distinct_estimates(spark, f"{store}/hll").collect()
    }
    one_shot = {
        r.group_key: r.est
        for r in events.groupBy(F.col("event_type").alias("group_key"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
        )
        .collect()
    }
    assert merged == one_shot

    q50 = {
        r.group_key: (r.q_0_5, r.n)
        for r in pipeline.read_quantile_estimates(spark, f"{store}/kll", [0.5]).collect()
    }
    truth = {
        r["event_type"]: sorted(x["value"] for x in r["vals"])
        for r in events.groupBy("event_type")
        .agg(F.collect_list(F.struct("value")).alias("vals"))
        .collect()
    }
    for g, vals in truth.items():
        est, n = q50[g]
        assert n == len(vals)
        true_rank = sum(1 for v in vals if v <= est) / len(vals)
        assert abs(true_rank - 0.5) <= 0.05


def test_outer_join_extends_inner_with_watermark_gated_nulls(spark, sf_dir):
    """The LEFT OUTER stream-stream join must contain exactly the inner
    join's matched pairs plus null-extended rows, and every null row's
    purchase must lie behind the per-side global watermark (min over both
    sides of max event time - 1 h) — the closure rule the oracle pins."""
    from distributed_graph_database_simulation_spark.streaming import windowed

    inner = windowed.stream_stream_click_purchase(spark, sf_dir).collect()
    outer = windowed.stream_outer_click_purchase(spark, sf_dir).collect()
    inner_pairs = {(r.purchase_id, r.click_id) for r in inner}
    matched = {(r.purchase_id, r.click_id) for r in outer if r.click_id is not None}
    assert matched == inner_pairs
    nulls = [r for r in outer if r.click_id is None]
    assert nulls, "no null-extended rows emitted — gating untested"
    import pyspark.sql.functions as F

    from distributed_graph_database_simulation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    sides = events.where(F.col("event_type").isin("click", "purchase")).groupBy(
        "event_type").agg(F.max("ts").alias("m")).collect()
    import datetime

    wm = min(r.m for r in sides) - datetime.timedelta(hours=1)
    p_ts = {
        r.event_id: r.ts
        for r in events.where(F.col("event_type") == "purchase").collect()
    }
    for r in nulls:
        assert p_ts[r.purchase_id] <= wm, (r.purchase_id, p_ts[r.purchase_id], wm)


def test_wau_ingest_batch_writes_distinct_pairs_and_replay_overwrites(spark, tmp_path):
    """The engagement sink's two claims: a batch's partial holds DISTINCT
    (day, user) pairs, and re-writing the same batch_id replaces (never
    extends) its partition."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_spark.streaming.ingest import (
        wau_ingest_batch,
    )

    store = str(tmp_path / "wau")
    batch = spark.createDataFrame(
        [("2024-03-01 10:00:00", 1), ("2024-03-01 11:00:00", 1),
         ("2024-03-02 09:00:00", 2)],
        "ts string, user_id long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    wau_ingest_batch(batch, 0, store)
    rows = {(str(r.d)[:10], r.user_id) for r in spark.read.parquet(store).collect()}
    assert rows == {("2024-03-01", 1), ("2024-03-02", 2)}  # same-day dedup
    wau_ingest_batch(batch, 0, store)  # replay
    assert spark.read.parquet(store).count() == 2  # replaced, not extended
