"""Count-min sketch store: estimator guarantees, merge linearity, and the
fault-injection the entry docstrings promise (an appended replay or a lost
partition flips ``mass_conserved`` on every reported row).

The reference has no frequency sketch (its query surface is 4 graph ops over
System V IPC, reference/primary_server.c); CMS is north-star §2c
infrastructure for vocabulary / heavy-hitter passes a 100 TB corpus cannot
answer with a raw per-key groupBy per batch window.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.operators.pipeline import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_point_estimates,
    cms_sketch,
    read_cms_store,
    write_cms_sketch,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 400 keys, Zipf-ish frequencies 1..80 — more keys than CMS_WIDTH so
    # collisions are guaranteed, like the gate corpus.
    rows = [(f"k{i:04d}", 1 + (80 * 7919 // (i + 100))) for i in range(400)]
    df = spark.createDataFrame(rows, "key string, n int")
    return df.select(
        "key", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_i")
    ).select("key")


def _exact(keys):
    return keys.groupBy("key").agg(F.count("*").cast("bigint").alias("n"))


def test_point_estimates_one_sided(spark, keys):
    """est >= true for EVERY key — the CMS guarantee (collisions add)."""
    sk = cms_sketch(keys, "key")
    est = cms_point_estimates(sk, keys.distinct(), "key")
    j = _exact(keys).join(est, "key")
    assert j.where(F.col("cms_est") < F.col("n")).count() == 0
    # and collisions are REAL at 400 keys / 64 buckets (non-vacuity)
    assert j.where(F.col("cms_est") > F.col("n")).count() > 0


def test_sketch_shape_and_mass(spark, keys):
    """depth*width counter grid at most; every depth row sums to N."""
    sk = cms_sketch(keys, "key").cache()
    n_total = keys.count()
    assert sk.count() <= CMS_DEPTH * CMS_WIDTH
    masses = sk.groupBy("j").agg(F.sum("cnt").alias("m")).collect()
    assert len(masses) == CMS_DEPTH
    assert all(r.m == n_total for r in masses)
    sk.unpersist()


def test_store_merge_equals_one_shot(spark, keys):
    """CMS merge is linear: the merged two-batch store equals the one-shot
    sketch of the whole input counter for counter."""
    base = tempfile.mkdtemp(prefix="dgds_cms_test_")
    try:
        tagged = keys.withColumn("h", F.crc32(F.col("key")) % 2)
        write_cms_sketch(tagged.where("h = 0"), "key", base, 0)
        write_cms_sketch(tagged.where("h = 1"), "key", base, 1)
        merged = read_cms_store(spark, base).withColumnRenamed("cnt", "m_cnt")
        oneshot = cms_sketch(keys, "key").withColumnRenamed("cnt", "o_cnt")
        diff = merged.join(oneshot, ["j", "bucket"], "full").where(
            ~F.col("m_cnt").eqNullSafe(F.col("o_cnt"))
        )
        assert diff.count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_replay_overwrites_not_appends(spark, keys):
    """Replaying batch 0 with the same batch_id must leave the merged store
    unchanged (dynamic partition overwrite — the idempotent-retry contract
    every sketch store here shares)."""
    base = tempfile.mkdtemp(prefix="dgds_cms_test_")
    try:
        write_cms_sketch(keys, "key", base, 0)
        before = {(r.j, r.bucket): r.cnt for r in read_cms_store(spark, base).collect()}
        write_cms_sketch(keys, "key", base, 0)  # replay
        after = {(r.j, r.bucket): r.cnt for r in read_cms_store(spark, base).collect()}
        assert before == after
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_mass_conservation_catches_append_fault(spark, keys):
    """The entry docstrings' promise: a replay that APPENDS (new batch_id,
    duplicated mass) or a DROPPED partition flips the exact per-depth-row
    mass invariant — the device the per-key eps envelope cannot provide
    (rare keys sit below the collision-noise floor)."""
    n_total = keys.count()

    def mass_ok(store_path):
        masses = (
            read_cms_store(spark, store_path)
            .groupBy("j")
            .agg(F.sum("cnt").alias("m"))
            .collect()
        )
        return len(masses) == CMS_DEPTH and all(r.m == n_total for r in masses)

    base = tempfile.mkdtemp(prefix="dgds_cms_test_")
    try:
        write_cms_sketch(keys, "key", base, 0)
        assert mass_ok(base)
        write_cms_sketch(keys, "key", base, 1)  # FAULT: replay appended
        assert not mass_ok(base)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    base = tempfile.mkdtemp(prefix="dgds_cms_test_")
    try:
        half = keys.limit(n_total // 2)
        write_cms_sketch(half, "key", base, 0)  # FAULT: lost the other half
        assert not mass_ok(base)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_entry_flags_all_true(spark, sf_dir):
    """Gate entries' flags hold on the real corpus (the oracle pins TRUE)."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        pipe_cms_heavy_hitters,
    )

    rows = pipe_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    assert all(r.cms_ge_exact and r.cms_within_eps and r.mass_conserved for r in rows)
