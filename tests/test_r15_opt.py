"""Round-15 optimization pins: the input-spread helper.

`spread_small_scan` exists because a one-file corpus arrives as ONE scan
partition and serializes every pre-exchange narrow operation onto a single
core (guide §2.5 input skew; measured 13.2 s -> 1.4 s warm on
mm_jpeg_decode at sf0.1/local[32]). These tests pin its two contracts:
parallelism is raised to the cluster's for degenerate inputs, and inputs
that are already split pass through untouched (the no-op-at-scale claim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.sources.tables import (
    load_table,
    spread_small_scan,
)


def test_spread_raises_single_partition_scan_to_cluster_width(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == 1  # the degenerate layout
    spread = spread_small_scan(docs)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # row identity: repartition reorders, never rewrites
    a = docs.orderBy("doc_id").collect()
    b = spread.orderBy("doc_id").collect()
    assert a == b


def test_spread_is_noop_on_already_wide_input(spark):
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    out = spread_small_scan(wide.toDF("id"))
    # identity — no repartition node added when the input is already split
    assert out.rdd.getNumPartitions() == wide.rdd.getNumPartitions()
    assert "RoundRobinPartitioning" not in out._jdf.queryExecution().executedPlan().toString()


def test_spread_preserves_predicate_pushdown(spark, sf_dir):
    """Filters written above the spread must still reach the parquet scan
    (PushDownPredicates moves them through RepartitionOperation)."""
    df = spread_small_scan(load_table(spark, sf_dir, "embeddings")).where(
        F.col("vec_id") < 8
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "LessThan(vec_id,8)" in plan, plan
