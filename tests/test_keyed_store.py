"""Pins for the bucketed keyed parquet store (MERGE-style upserts).

The contract under test: upserts replace/insert exactly the given keys,
UNTOUCHED bucket partitions' files are never rewritten (the whole point of
the bucket surgery — an upsert must not become a table rewrite), replays
are idempotent, within-batch conflicts resolve latest-wins by version, and
deletes remove rows (including the empty-partition edge where every row of
a bucket dies).
"""

from __future__ import annotations

import os

import pytest

from distributed_graph_database_simulation_spark.sources.keyed_store import (
    KeyedParquetStore,
)


def _rows(store):
    return {
        (r["k"], r["val"], r["ver"]) for r in store.read().collect()
    }


def _part_files(path):
    """{partition dir -> sorted (name, mtime_ns) of parquet files}."""
    out = {}
    for d in os.listdir(path):
        if not d.startswith("key_bucket="):
            continue
        full = os.path.join(path, d)
        out[d] = sorted(
            (f, os.stat(os.path.join(full, f)).st_mtime_ns)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
    return out


@pytest.fixture()
def store(spark, tmp_path):
    s = KeyedParquetStore(
        spark, str(tmp_path / "store"), "k", n_buckets=8, version_col="ver"
    )
    base = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(100)], "k long, val string, ver int"
    )
    s.write_full(base)
    return s


def test_full_write_roundtrip(store):
    assert _rows(store) == {(i, f"v{i}", 1) for i in range(100)}


def test_upsert_replaces_inserts_and_leaves_rest(spark, store):
    updates = spark.createDataFrame(
        [(3, "updated", 2), (200, "new", 2)], "k long, val string, ver int"
    )
    stats = store.upsert(updates)
    want = {(i, f"v{i}", 1) for i in range(100) if i != 3}
    want |= {(3, "updated", 2), (200, "new", 2)}
    assert _rows(store) == want
    assert stats["buckets_touched"] <= 2  # 2 keys -> at most 2 buckets


def test_untouched_partitions_are_not_rewritten(spark, store):
    before = _part_files(store.path)
    updates = spark.createDataFrame(
        [(7, "touched", 2)], "k long, val string, ver int"
    )
    store.upsert(updates)
    after = _part_files(store.path)
    from pyspark.sql import functions as F

    bucket = spark.createDataFrame([(7,)], "k long").select(
        F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("b")
    ).first()["b"]
    touched = f"key_bucket={bucket}"
    assert before[touched] != after[touched]
    for d, files in before.items():
        if d != touched:
            assert after[d] == files, f"{d} was rewritten by an unrelated upsert"


def test_upsert_replay_is_idempotent(spark, store):
    updates = spark.createDataFrame(
        [(5, "x", 2), (6, "y", 2)], "k long, val string, ver int"
    )
    store.upsert(updates)
    first = _rows(store)
    store.upsert(updates)  # replayed batch (retry semantics)
    assert _rows(store) == first


def test_within_batch_latest_version_wins(spark, store):
    updates = spark.createDataFrame(
        [(9, "old", 2), (9, "newer", 5), (9, "mid", 3)],
        "k long, val string, ver int",
    )
    store.upsert(updates)
    assert (9, "newer", 5) in _rows(store)
    assert not any(r[0] == 9 and r[1] != "newer" for r in _rows(store))


def test_stale_version_still_applies_but_deterministically(spark, store):
    # SCD1 semantics are "batch replaces row" — cross-batch ordering is the
    # caller's contract; within-batch resolution is what the store pins.
    updates = spark.createDataFrame(
        [(2, "later", 9)], "k long, val string, ver int"
    )
    store.upsert(updates)
    assert (2, "later", 9) in _rows(store)


def test_delete_removes_rows_and_empty_buckets(spark, store):
    import shutil  # noqa: F401  (exercised inside delete)

    keys = spark.createDataFrame([(i,) for i in range(100)], "k long")
    stats = store.delete(keys)
    assert stats["rows_written"] == 0
    # store is now empty: every partition directory removed
    remaining = [
        d for d in os.listdir(store.path) if d.startswith("key_bucket=")
    ]
    assert remaining == []


def test_partial_delete_keeps_cohabiting_keys(spark, store):
    keys = spark.createDataFrame([(3,), (4,)], "k long")
    store.delete(keys)
    got = _rows(store)
    assert not any(r[0] in (3, 4) for r in got)
    assert len(got) == 98


def test_upsert_on_missing_store_is_initial_load(spark, tmp_path):
    s = KeyedParquetStore(
        spark, str(tmp_path / "fresh"), "k", n_buckets=4, version_col="ver"
    )
    stats = s.upsert(
        spark.createDataFrame([(1, "a", 1)], "k long, val string, ver int")
    )
    assert stats["initial_load"] is True
    assert _rows(s) == {(1, "a", 1)}


def test_upsert_scan_is_partition_pruned(spark, store):
    """The MERGE read must prune to the affected bucket partitions at the
    source (PartitionFilters), not scan the table and filter later."""
    from pyspark.sql import functions as F

    buckets = [0, 1]
    df = spark.read.parquet(store.path).where(
        F.col("key_bucket").isin(buckets)
    )
    jdf = df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(mode)
    assert "PartitionFilters" in plan and "key_bucket" in plan


# ---------------------------------------------------------------------------
# only_if_newer MERGE mode + the streaming user-state ingester
# ---------------------------------------------------------------------------

def test_only_if_newer_keeps_stored_newer_rows(spark, store):
    stale = spark.createDataFrame(
        [(3, "stale", 0)], "k long, val string, ver int"  # ver 0 < stored 1
    )
    store.upsert(stale, only_if_newer=True)
    assert (3, "v3", 1) in _rows(store)  # stored row survived
    newer = spark.createDataFrame(
        [(3, "fresh", 2)], "k long, val string, ver int"
    )
    store.upsert(newer, only_if_newer=True)
    assert (3, "fresh", 2) in _rows(store)


def test_user_state_ingest_replay_of_stale_batch_converges(spark, tmp_path):
    """The CDC contract: apply batch 1, then batch 2 (newer events), then
    REPLAY batch 1 — state must equal the batch-1-then-2 state exactly
    (max event-time wins against the store, not batch order)."""
    from distributed_graph_database_simulation_spark.streaming.ingest import (
        user_state_ingest_batch,
    )

    from datetime import datetime

    path = str(tmp_path / "state")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    b1 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), 7, "view", 1.0),
            (2, datetime(2024, 1, 1, 11, 0), 7, "click", 2.0),
            (3, datetime(2024, 1, 1, 10, 30), 8, "view", 3.0),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (4, datetime(2024, 1, 1, 12, 0), 7, "purchase", 9.0),
        ],
        schema,
    )
    user_state_ingest_batch(spark, b1, 0, path)
    user_state_ingest_batch(spark, b2, 1, path)
    want = {
        (7, "purchase", 9.0),
        (8, "view", 3.0),
    }

    def state():
        return {
            (r["user_id"], r["last_event_type"], r["last_value"])
            for r in spark.read.parquet(path).collect()
        }

    assert state() == want
    user_state_ingest_batch(spark, b1, 0, path)  # stale replay
    assert state() == want, "stale replay clobbered newer state"


def test_stream_user_state_ingest_end_to_end(spark, tmp_path):
    """Real Structured Streaming run: parquet-source stream -> foreachBatch
    MERGE sink, availableNow catch-up trigger."""
    import pyspark.sql.functions as F

    from distributed_graph_database_simulation_spark.streaming.ingest import (
        stream_user_state_ingest,
    )

    src_dir = str(tmp_path / "drops")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = stream_user_state_ingest(
        spark, stream, str(tmp_path / "state"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "state"))
    # one row per user, and each row matches the batch-computed latest event
    want = (
        events.select(
            "user_id",
            F.struct(
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
            F.col("ev.event_type").alias("last_event_type"),
            F.col("ev.value").alias("last_value"),
        )
    )
    got_set = {
        (r["user_id"], r["last_event_type"], r["last_value"])
        for r in got.collect()
    }
    want_set = {
        (r["user_id"], r["last_event_type"], r["last_value"])
        for r in want.collect()
    }
    assert got_set == want_set and len(got_set) > 0


def test_randomized_operation_sequence_matches_dict_model(spark, tmp_path):
    """Model-based pin: a deterministic pseudo-random sequence of upserts
    (both modes) and deletes must leave the store equal to a plain dict
    model applying the same resolution rules."""
    import random

    rng = random.Random(1234)
    s = KeyedParquetStore(
        spark, str(tmp_path / "model"), "k", n_buckets=8, version_col="ver"
    )
    model: dict[int, tuple[str, int]] = {}

    def batch_rows(n):
        return [
            (rng.randrange(40), f"w{rng.randrange(1000)}", rng.randrange(10))
            for _ in range(n)
        ]

    init = batch_rows(30)
    s.write_full(spark.createDataFrame(init, "k long, val string, ver int"))
    # model: latest-wins = max (ver, val) per key
    for k, val, ver in init:
        if k not in model or (ver, val) > (model[k][1], model[k][0]):
            model[k] = (val, ver)

    for _step in range(6):
        op = rng.choice(["upsert", "upsert_newer", "delete"])
        if op == "delete":
            keys = sorted({rng.randrange(40) for _ in range(4)})
            s.delete(spark.createDataFrame([(k,) for k in keys], "k long"))
            for k in keys:
                model.pop(k, None)
            continue
        rows = batch_rows(8)
        df = spark.createDataFrame(rows, "k long, val string, ver int")
        resolved: dict[int, tuple[str, int]] = {}
        for k, val, ver in rows:
            if k not in resolved or (ver, val) > (resolved[k][1], resolved[k][0]):
                resolved[k] = (val, ver)
        if op == "upsert":
            s.upsert(df)
            model.update(resolved)
        else:
            s.upsert(df, only_if_newer=True)
            for k, (val, ver) in resolved.items():
                if k not in model or (ver, val) > (model[k][1], model[k][0]):
                    model[k] = (val, ver)

    got = {r["k"]: (r["val"], r["ver"]) for r in s.read().collect()}
    assert got == model


def test_merge_delta_single_surgery_semantics(spark, store):
    """merge_delta = upsert + delete in one read/write: upserted keys carry
    new values, deleted keys are gone, delete wins on overlap, untouched
    keys survive, and a replay is a no-op."""
    ups = spark.createDataFrame(
        [(5, "new5", 2), (200, "new200", 2), (7, "ghost7", 2)],
        "k long, val string, ver int",
    )
    dels = spark.createDataFrame([(3,), (7,)], "k long")  # 7 overlaps ups
    store.merge_delta(ups, dels)
    got = _rows(store)
    assert (5, "new5", 2) in got and (200, "new200", 2) in got
    assert not any(k in (3, 7) for k, _, _ in got)  # delete wins overlap
    assert (4, "v4", 1) in got  # untouched survives
    store.merge_delta(ups, dels)  # replay
    assert _rows(store) == got


def test_merge_delta_clears_emptied_buckets(spark, tmp_path):
    """A bucket whose every key is tombstoned by the delta loses its
    partition directory (same surgery as delete())."""
    s = KeyedParquetStore(spark, str(tmp_path / "s2"), "k", n_buckets=4)
    s.write_full(spark.createDataFrame([(i, i * 10) for i in range(40)], "k long, v long"))
    # Tombstone every key but one: the survivor's bucket must be the only
    # partition directory left on disk.
    dels = spark.createDataFrame([(i,) for i in range(1, 40)], "k long")
    empty_ups = spark.createDataFrame([], "k long, v long")
    s.merge_delta(empty_ups, dels)
    assert {tuple(r) for r in s.read().collect()} == {(0, 0)}
    survivor_bucket = s._affected_buckets(
        spark.createDataFrame([(0,)], "k long")
    )[0]
    assert set(_part_files(str(tmp_path / "s2"))) == {
        f"key_bucket={survivor_bucket}"
    }


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    """After several upsert batches a bucket holds one file per touched
    write; compact() rewrites ONLY over-threshold buckets down to one
    file each, preserves content exactly, and leaves compliant buckets'
    files untouched (mtime-stable)."""
    s = KeyedParquetStore(spark, str(tmp_path / "c"), "k", n_buckets=4)
    s.write_full(spark.createDataFrame([(i, i) for i in range(40)], "k long, v long"))
    for wave in range(1, 4):  # three more waves touching every bucket
        # write_partitions pins tasks on the KEY (not the bucket), so every
        # touched bucket collects multiple files — the small-file census
        # compact() exists for. (Default writes are bucket-aligned since
        # r15: one file per touched bucket, which would make this vacuous.)
        s.upsert(spark.createDataFrame(
            [(i, i + wave * 100) for i in range(0, 40, 2)], "k long, v long"
        ), write_partitions=3)
    before_rows = {tuple(r) for r in s.read().collect()}
    before_files = _part_files(str(tmp_path / "c"))
    assert any(len(v) > 1 for v in before_files.values())
    stats = s.compact(max_files_per_bucket=1)
    assert stats["buckets_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]
    after_files = _part_files(str(tmp_path / "c"))
    assert all(len(v) == 1 for v in after_files.values())
    assert {tuple(r) for r in s.read().collect()} == before_rows
    # a second compact is a no-op: census already compliant
    stats2 = s.compact(max_files_per_bucket=1)
    assert stats2["buckets_compacted"] == 0
    assert _part_files(str(tmp_path / "c")) == after_files  # mtimes stable
