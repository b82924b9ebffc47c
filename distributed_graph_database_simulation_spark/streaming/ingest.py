"""Streaming corpus ingestion with continuous near-dup detection.

The batch-side signature store (``dedup.write_signature_store`` /
``dedup_against_store``) made incremental dedup a two-step API; this module
closes the loop for a CONTINUOUS pipeline: a ``foreachBatch`` sink that, per
micro-batch of documents,

1. finds near-dup pairs touching the batch (vs the store AND within the
   batch) with the LSH + exact-verification pair-finder,
2. writes those pairs to a parquet results table, and
3. appends the batch's banding state (bands + shingles) to the store so the
   NEXT batch dedups against it —

without ever re-hashing the historical corpus (the store is read, not
recomputed; cost per batch is batch-size + candidate-proportional).

Idempotence under micro-batch replay: Structured Streaming re-runs a batch
after a failure with the SAME ``batch_id``, so every write here is
``partitionBy(batch_id)`` + dynamic partition overwrite — a replayed batch
overwrites exactly its own partitions (the standard idempotent-foreachBatch
pattern), never duplicating store rows or pair rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _write_partition(df: DataFrame, batch_id: int, path: str) -> None:
    # Per-write dynamic overwrite (not a session conf set — that would
    # silently change overwrite semantics of unrelated partitioned writes
    # later in the shared session).
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def dedup_ingest_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, store_path: str, pairs_path: str
) -> None:
    """Process one micro-batch: emit pairs, then extend the store.

    Pure function of (batch, batch_id, store state) — called by the
    foreachBatch sink below and directly unit-testable without a stream.
    """
    import os

    from ..operators.dedup import (
        _bands,
        _minhash_sigs,
        _shingled,
        dedup_against_frames,
        minhash_lsh_df,
    )

    store_exists = os.path.isdir(f"{store_path}/bands")
    if store_exists:
        # Exclude this batch's OWN partition from the store side: on a
        # replayed micro-batch the store already holds the batch's bands,
        # and reading them back would emit self-pairs and duplicate the
        # batch-internal pairs — replay must reproduce the original output.
        bands_old = (
            spark.read.parquet(f"{store_path}/bands")
            .where(F.col("batch_id") != int(batch_id))
            .select("doc_id", "band_id", "band_hash")
        )
        sh_old = (
            spark.read.parquet(f"{store_path}/shingles")
            .where(F.col("batch_id") != int(batch_id))
            .select("doc_id", "shingles")
        )
        pairs = dedup_against_frames(batch, bands_old, sh_old)
    else:
        pairs = minhash_lsh_df(batch)
    # Pairs first, store second: if the job dies between the two writes the
    # replay overwrites the same pair partition and re-extends the store —
    # both idempotent per batch_id. (Store-first would also be safe, but
    # pairs-first means a reader never sees store state whose pairs are
    # missing once the batch commits.)
    _write_partition(pairs, batch_id, pairs_path)
    sh = _shingled(batch)
    _write_partition(_bands(_minhash_sigs(sh)), batch_id, f"{store_path}/bands")
    _write_partition(sh, batch_id, f"{store_path}/shingles")


def stream_dedup_ingest(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_path: str,
):
    """Attach the continuous-dedup sink to a streaming documents frame.

    ``stream`` must carry (doc_id, text). Returns the started
    StreamingQuery (caller awaits / stops). With ``availableNow`` triggers
    this doubles as a catch-up batch ingester over a directory of parquet
    drops.
    """

    def sink(batch: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(spark, batch, batch_id, store_path, pairs_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_sketch_ingest(
    spark: SparkSession,
    stream: DataFrame,
    key_col: str,
    value_col: str,
    group_col: str,
    store_path: str,
    checkpoint_path: str,
):
    """Continuous sketch-store ingestion: per micro-batch, write the
    batch's per-group HLL (distinct over ``key_col``) AND KLL (quantiles
    over ``value_col``) sketches into the mergeable stores under
    ``store_path`` — the streaming face of ``pipeline.write_*_sketch``.
    Reports over the stores (``read_distinct_estimates`` /
    ``read_quantile_estimates``) then never touch raw history: each batch
    contributes KB-scale mergeable state instead of raw keys.

    Micro-batch replay safety comes from the store contract itself: the
    writers partition by the streaming ``batch_id`` with dynamic overwrite,
    so a replayed batch replaces exactly its own partition. Returns the
    started StreamingQuery (availableNow trigger — doubles as a catch-up
    ingester over parquet drops).
    """
    from ..operators.pipeline import write_distinct_sketch, write_quantile_sketch

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        write_distinct_sketch(
            batch, key_col, group_col, f"{store_path}/hll", int(batch_id)
        )
        write_quantile_sketch(
            batch, value_col, group_col, f"{store_path}/kll", int(batch_id)
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def user_state_ingest_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, store_path: str
) -> None:
    """Process one micro-batch of events into the keyed state store: the
    CDC-style continuously-maintained materialized view (latest event_type
    / value / timestamp per user) a serving layer reads instead of
    replaying raw history.

    Per batch: collapse to one row per user (max event-time, event_id
    tie-break — deterministic), then MERGE into a
    :class:`~..sources.keyed_store.KeyedParquetStore` with
    ``only_if_newer=True``, versioned by event time. Replay safety is
    BY VALUE, not by batch_id bookkeeping: re-applying any batch — even a
    stale one after newer data landed — resolves max-version-wins against
    the stored rows and converges to the same state. Cost per batch is
    proportional to the touched bucket partitions, never the table.
    """
    from pyspark.sql import functions as F  # noqa: F811 — local for clarity

    from ..sources.keyed_store import KeyedParquetStore

    if batch.isEmpty():
        return
    latest = (
        batch.select(
            "user_id",
            F.struct(
                # cast first: the raw testdata stream carries TIMESTAMP_NTZ
                # and unix_micros requires TIMESTAMP (the r03 loader lesson —
                # an ingester must be total over the physical ts shapes)
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
                F.col("value").cast("double").alias("value"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.max("ev").alias("ev"))
        .select(
            "user_id",
            F.col("ev.ts_us").alias("ts_us"),
            F.col("ev.event_id").alias("last_event_id"),
            F.col("ev.event_type").alias("last_event_type"),
            F.col("ev.value").alias("last_value"),
        )
    )
    store = KeyedParquetStore(
        spark, store_path, "user_id", n_buckets=64, version_col="ts_us"
    )
    store.upsert(latest, only_if_newer=True)


def stream_user_state_ingest(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
):
    """Attach the keyed-state MERGE sink to a streaming events frame.

    ``stream`` must carry (event_id, ts, user_id, event_type, value).
    Returns the started StreamingQuery (availableNow trigger — doubles as
    a catch-up ingester over parquet drops).
    """

    def sink(batch: DataFrame, batch_id: int) -> None:
        user_state_ingest_batch(spark, batch, int(batch_id), store_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
