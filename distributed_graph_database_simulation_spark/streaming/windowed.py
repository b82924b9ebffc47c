"""Structured Streaming operators over the ``events`` table.

The reference is strictly request/response — no streams exist anywhere in it
(SURVEY.md §2b "streaming": absent). This module is the north-star streaming
surface, built the idiomatic way: ``readStream`` (file source) ->
event-time windowed aggregation -> sink, executed here with the
``availableNow`` trigger so a bounded run processes the whole table and the
result can be differentially checked against the same DuckDB oracle as the
batch operator.

Most registry entries use **complete** output mode into a memory sink: with
a bounded source that reproduces the batch answer exactly (full-table oracle
parity). The at-scale posture — append mode + watermark into a real file
sink — is ALSO driver-certified: ``stream_hourly_file_sink`` runs the
production shape (parquet sink + checkpointLocation, append emission gated
by the watermark) against an oracle restricted to watermark-closed windows,
so the emission gating itself differential-checks; its checkpoint-recovery
exactly-once contract is pinned in tests/test_streaming.py.

Scale posture: file-source streaming partitions by input file; the windowed
aggregate is an incremental stateful hash agg keyed on (window, event_type)
— state size is bounded by window cardinality, and a watermark bounds it in
wall-clock. ``spark.sql.shuffle.partitions`` sizes the state store exactly
like a batch shuffle.
"""

from __future__ import annotations

import os
import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import dec


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same ts normalization as
    the batch loader (nanos-bigint / TIMESTAMP_NTZ / TIMESTAMP -> TIMESTAMP)."""
    from ..sources.tables import _normalize_ts, ensure_events_readable

    ensure_events_readable(spark)  # vanilla sessions reject TIMESTAMP(NANOS)
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # events.parquet shipped as a directory of part files (standard
        # Spark writer output): stream the directory itself — a leaf-name
        # glob for "events.parquet" would match nothing and silently yield
        # an empty stream.
        stream = spark.readStream.schema(schema).parquet(path)
    else:
        # Single file: the file source requires a directory, so stream the
        # sf dir filtered down to the events file (at scale this is the
        # standard drop-files-in-a-dir ingestion layout).
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return _normalize_ts(stream)


def _run_bounded(df: DataFrame, spark: SparkSession, name: str, mode: str) -> DataFrame:
    """Run a streaming aggregation to completion (availableNow) into a memory
    sink and return the materialized result."""
    sink = re.sub(r"\W", "_", name)
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows, streaming execution.

    Same answer as the batch ``rel_events_hourly`` (shared oracle): the
    stream's incremental state agg must converge to the batch hash agg.
    """
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )
    return _run_bounded(agg, spark, "stream_events_hourly", "complete")


STREAM_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


def stream_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour, 30-minute slide): each event lands in two
    overlapping windows — the streaming overlap-assignment path."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    return _run_bounded(agg, spark, "stream_events_sliding", "complete")


STREAM_EVENTS_SLIDING_SQL = """
WITH assigned AS (
  SELECT event_type, value,
         UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start
  FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY window_start, event_type
"""


def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-minute gap) per user, streaming.

    ``session_window`` is the engine-native form of the batch lag/cumsum
    sessionization (rel_event_sessions); the oracle rebuilds sessions with
    the standard gap-and-islands SQL so both engines must agree on every
    session's span and size.
    """
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_bounded(agg, spark, "stream_user_sessions", "complete")


# Gap-and-islands reconstruction; session end = last event + gap (Spark's
# session_window end semantics).
STREAM_USER_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


def _user_totals_fold(key, pdfs, state):
    """Per-user state fold: (event count, value sum in exact 1e-4 units).

    Value sums are kept in integer ten-thousandths so state stays exact
    regardless of batch order (float accumulation would drift)."""
    import numpy as np

    count, units = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        count += len(pdf)
        # round per ROW before summing: each 4-decimal value scales to
        # an exact integer; summing floats first would reintroduce drift
        units += int(np.round(pdf["value"].to_numpy() * 10_000).sum())
    state.update((count, units))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [count], "sum_value": [units / 10_000.0]}
    )


def _stateful_user_totals(ev: DataFrame) -> DataFrame:
    """applyInPandasWithState pipeline over any events-shaped stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return ev.groupBy("user_id").applyInPandasWithState(
        _user_totals_fold,
        outputStructType="user_id BIGINT, n_events BIGINT, sum_value DOUBLE",
        stateStructType="count BIGINT, units BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _final_user_totals(result: DataFrame) -> DataFrame:
    """Keep each user's FINAL cumulative emission from a multi-batch run.

    The final emission is the row with the maximal n_events (count strictly
    increases every batch that touches the user); taking sum_value via
    max_by keeps the pair atomic — independent max(sum_value) would break
    if values can be negative (sum_value is not monotone in that case)."""
    return result.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )


def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` (the arbitrary-state API — the engine's escape
    hatch when windowed aggregates can't express the state machine).

    Each micro-batch folds its rows into state and emits the running
    totals; the final emission therefore equals the batch GROUP BY, which
    is the oracle.
    """
    out = _stateful_user_totals(_events_stream(spark, sf_dir))
    result = _run_bounded(out, spark, "stream_stateful_user_totals", "update")
    return _final_user_totals(result)


STREAM_STATEFUL_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id
"""


def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming events feed enriched against the
    (static, broadcastable) customer dimension, then windowed per segment.

    The static side is re-read per micro-batch by the engine; at scale it is
    a broadcast-hash join inside each batch — no stream state at all, which
    is why stream-static inner joins need no watermark."""
    from ..sources.tables import load_table

    ev = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(cust, "user_id")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("day"), "c_mktsegment", "n_events", "sum_value")
    )
    return _run_bounded(agg, spark, "stream_static_enrichment", "complete")


STREAM_STATIC_ENRICHMENT_SQL = """
SELECT date_trunc('day', e.ts) AS day, c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY date_trunc('day', e.ts), c.c_mktsegment
"""


def stream_stream_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same user's
    clicks in the preceding hour.

    Both sides carry event-time watermarks; the join condition's time bounds
    let the engine evict click state older than (watermark - 1 hour) — the
    canonical bounded-state stream-stream join. Inner-join matches emit as
    soon as both rows have arrived (no watermark-close delay), so a bounded
    availableNow run yields exactly the batch answer."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        # exact integer seconds: engine-portable, no float timestamp math
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_micros"),
    )
    return _run_bounded(joined, spark, "stream_stream_click_purchase", "append")


STREAM_STREAM_CLICK_PURCHASE_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros
FROM events p
JOIN events c ON c.event_type = 'click' AND p.event_type = 'purchase'
  AND c.user_id = p.user_id
  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
"""


def stream_outer_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantically hardest
    join mode the engine has: matched (purchase, click) pairs emit eagerly
    like the inner join, but a purchase with NO click in its preceding
    hour may emit its null-extended row only once the global watermark
    proves no late click can still match it (purchase_ts <= min over both
    sides of (side max event time - 1 h) — verified against the actual
    boundary rows at both shipped sfs). The oracle
    applies exactly that rule — full outer-join rows for purchases inside
    the closed region, inner-only rows for the final horizon — so the
    null-emission gating itself differential-checks, the same device as
    ``stream_hourly_file_sink``. The final flush rides the engine's
    requires-another-batch step after the last data batch advances the
    watermark.
    """
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "purchase_id",
        "user_id",
        F.col("click_id"),  # NULL on the watermark-certified no-click rows
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_micros"),
    )
    return _run_bounded(joined, spark, "stream_outer_click_purchase", "append")


# Null-extension closure: a purchase's null row emits once no future
# click can match it — any future click has ts above the GLOBAL watermark,
# and the join needs click_ts <= purchase_ts, so the closed region is
# purchase_ts <= global watermark. The global watermark is the MIN over
# both watermark operators of (that side's max event time - 1 h); clicks
# and purchases are separately filtered streams, so each side's own max
# matters (at the shipped sfs the last click precedes the last event by
# nearly an hour — a table-level max here would certify the wrong rows).
# Spark's event-time stats carry milliseconds, hence the ms truncation.
STREAM_OUTER_CLICK_PURCHASE_SQL = """
WITH wm AS (
  SELECT LEAST(
    (SELECT date_trunc('milliseconds', MAX(ts)) FROM events WHERE event_type = 'click'),
    (SELECT date_trunc('milliseconds', MAX(ts)) FROM events WHERE event_type = 'purchase')
  ) - INTERVAL '1 hour' AS w
),
p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
matched AS (
  SELECT p.purchase_id, p.user_id, c.click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros
  FROM p JOIN c ON c.user_id = p.user_id
    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
),
unmatched_closed AS (
  SELECT p.purchase_id, p.user_id,
         CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS BIGINT) AS lag_micros
  FROM p, wm
  WHERE p.ts <= wm.w
    AND NOT EXISTS (
      SELECT 1 FROM c WHERE c.user_id = p.user_id
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour')
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched_closed
"""


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup under a watermark: the events stream unioned with a
    second copy of itself (every row arrives twice) and collapsed by
    ``dropDuplicatesWithinWatermark`` on event_id.

    First occurrence passes through and is emitted immediately; duplicates
    are dropped while the key is within the watermark horizon, after which
    its state is evicted — the bounded-state form of streaming dedup (plain
    ``dropDuplicates`` on a stream retains keys forever)."""
    doubled = _events_stream(spark, sf_dir).unionByName(_events_stream(spark, sf_dir))
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return _run_bounded(deduped, spark, "stream_dedup_events", "append")


STREAM_DEDUP_EVENTS_SQL = """
SELECT event_id, user_id, event_type FROM events
"""


def stream_hourly_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production sink shape, driver-certified: watermarked tumbling
    windows in APPEND mode into a real parquet file sink with a
    checkpointLocation — exactly the pipeline a deployment runs, not the
    complete-mode memory sink the other entries use for full-table oracle
    parity.

    Append emits a window only once its end passes the event-time
    watermark (max event time − 1 h), so the bounded availableNow run
    emits every window except those within the final watermark horizon —
    and the oracle applies the same closure predicate, certifying the
    emission gating itself, not just the aggregate values. The final
    flush rides the engine's requires-another-batch step: after the last
    data batch advances the watermark, one more batch evicts and writes
    the newly closed windows.

    The checkpoint/recovery contract of this sink (exactly-once emission
    across restarts) is pinned separately in
    tests/test_streaming.py::test_file_sink_checkpoint_recovery_no_duplicate_windows.
    """
    import shutil
    import tempfile

    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )
    # Per-call unique sink+checkpoint (concurrent gate runs must not share
    # state); removed after materialization like the keyed-store entry.
    base = tempfile.mkdtemp(prefix="dgds_stream_file_sink_")
    q = (
        agg.writeStream.format("parquet")
        .option("path", os.path.join(base, "out"))
        .option("checkpointLocation", os.path.join(base, "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(os.path.join(base, "out")).localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return out


# Only watermark-closed windows are in the sink: window end <= final
# watermark (max ts - 1 hour). The strictness of the comparison matters
# only when max(ts) - 1 h lands exactly on an hour boundary, which the
# event data's microsecond timestamps never do.
STREAM_HOURLY_FILE_SINK_SQL = """
WITH wm AS (SELECT MAX(ts) - INTERVAL '1 hour' AS w FROM events)
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events, wm
WHERE date_trunc('hour', ts) + INTERVAL '1 hour' <= wm.w
GROUP BY date_trunc('hour', ts), event_type
"""


STREAMING_QUERIES: dict[str, tuple] = {
    "stream_events_hourly": (stream_events_hourly, STREAM_EVENTS_HOURLY_SQL),
    "stream_events_sliding": (stream_events_sliding, STREAM_EVENTS_SLIDING_SQL),
    "stream_user_sessions": (stream_user_sessions, STREAM_USER_SESSIONS_SQL),
    "stream_stateful_user_totals": (
        stream_stateful_user_totals,
        STREAM_STATEFUL_USER_TOTALS_SQL,
    ),
    "stream_static_enrichment": (stream_static_enrichment, STREAM_STATIC_ENRICHMENT_SQL),
    "stream_stream_click_purchase": (
        stream_stream_click_purchase,
        STREAM_STREAM_CLICK_PURCHASE_SQL,
    ),
    "stream_dedup_events": (stream_dedup_events, STREAM_DEDUP_EVENTS_SQL),
    "stream_hourly_file_sink": (stream_hourly_file_sink, STREAM_HOURLY_FILE_SINK_SQL),
    "stream_outer_click_purchase": (
        stream_outer_click_purchase,
        STREAM_OUTER_CLICK_PURCHASE_SQL,
    ),
}

# staged r10: the foreachBatch sketch-store ingestion path (r09 verdict #4).
# Imported at the bottom: ingest.py imports _events_stream from this module,
# so a top-of-file import would be circular.
from ..operators.dedup import _NGRAM_ORACLE_CORE  # noqa: E402
from .ingest import (  # noqa: E402
    STREAM_CMS_INGEST_SQL,
    STREAM_COMPACT_INGEST_SQL,
    STREAM_CRAWL_DIFF_INGEST_SQL,
    STREAM_LINKAGE_INGEST_SQL,
    STREAM_WAU_INGEST_SQL,
    STREAM_TOKEN_COUNT_INGEST_SQL,
    STREAM_SCD2_INGEST_SQL,
    STREAM_SKETCH_INGEST_SQL,
    STREAM_USER_STATE_INGEST_SQL,
    stream_cms_ingest_entry,
    stream_compact_ingest_entry,
    stream_crawl_diff_ingest_entry,
    stream_wau_ingest_entry,
    stream_dedup_ingest_entry,
    stream_linkage_ingest_entry,
    stream_scd2_ingest_entry,
    stream_sketch_ingest_entry,
    stream_token_count_ingest_entry,
    stream_user_state_ingest_entry,
)

STREAMING_QUERIES["stream_sketch_ingest"] = (
    stream_sketch_ingest_entry,
    STREAM_SKETCH_INGEST_SQL,
)
# Union of per-batch pair partitions == all near-dup pairs, so the ingest
# entry shares the exhaustive (prefix-filtered) ngram-Jaccard oracle.
STREAMING_QUERIES["stream_dedup_ingest"] = (
    stream_dedup_ingest_entry,
    _NGRAM_ORACLE_CORE,
)
# CDC keyed-state materialized view: latest event per user, by-value
# replay stressed in the entry itself.
STREAMING_QUERIES["stream_user_state_ingest"] = (
    stream_user_state_ingest_entry,
    STREAM_USER_STATE_INGEST_SQL,
)
# staged r11: streaming CMS frequency store with batch-0 replay stress.
STREAMING_QUERIES["stream_cms_ingest"] = (
    stream_cms_ingest_entry,
    STREAM_CMS_INGEST_SQL,
)
# staged r11: incremental SCD2 history maintenance with by-value replay.
STREAMING_QUERIES["stream_scd2_ingest"] = (
    stream_scd2_ingest_entry,
    STREAM_SCD2_INGEST_SQL,
)
# staged r12: continuous BPE token accounting (linear counts store with
# archive-derived batch-0 replay stress).
STREAMING_QUERIES["stream_token_count_ingest"] = (
    stream_token_count_ingest_entry,
    STREAM_TOKEN_COUNT_INGEST_SQL,
)
# staged r14 (r13 build): continuous crawl digest store — streaming MERGE
# backfill, idempotent delta application (upsert + delete), delta replayed.
STREAMING_QUERIES["stream_crawl_diff_ingest"] = (
    stream_crawl_diff_ingest_entry,
    STREAM_CRAWL_DIFF_INGEST_SQL,
)
# staged r14 (r13 build): continuous engagement accounting — (day, user)
# pair store with batch-partition replay stress, served by the
# first-in-window DAU/WAU operator.
STREAMING_QUERIES["stream_wau_ingest"] = (
    stream_wau_ingest_entry,
    STREAM_WAU_INGEST_SQL,
)
# staged r15 (r14 build): OPTIMIZE-under-ingest — mid-stream keyed-store
# compaction with hard-failing file census and content-preservation oracle.
STREAMING_QUERIES["stream_compact_ingest"] = (
    stream_compact_ingest_entry,
    STREAM_COMPACT_INGEST_SQL,
)
# staged r16 (r15 build): continuous record linkage — gram/record stores
# bucketed on their join keys, cumulative stop-gram df cap, batch-1 replay
# stress; oracle replays both batches' block sets stage-for-stage.
STREAMING_QUERIES["stream_linkage_ingest"] = (
    stream_linkage_ingest_entry,
    STREAM_LINKAGE_INGEST_SQL,
)
