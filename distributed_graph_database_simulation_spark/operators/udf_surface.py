"""Remaining Python-extension surfaces: grouped-agg pandas UDAF + Python UDTF.

The reference has no extension surface at all (SURVEY.md §2b, "UDF/UDAF/UDTF
absent" — its only scalar function is the filename parse ``graphIdx``,
``primary_server.c:43-51``). The rest of this repo already exercises
``applyInPandas`` (traversal kernels), ``mapInPandas`` (multimodal) and
``applyInPandasWithState`` (streaming); this module completes the checklist
with the two remaining surfaces:

- a **grouped-aggregate pandas UDF** (Arrow-vectorized UDAF usable inside
  ``groupBy().agg``) — the slow-path escape hatch for aggregates Catalyst
  lacks, kept exact by integer arithmetic so it stays oracle-checkable;
- a **Python UDTF** (table function, variable-cardinality output per input
  row) joined laterally in ``spark.sql``.

Both are deliberately *exact* (integers until one final shared float
division) so the driver's value-hash gate applies — UDF surfaces are usually
where cross-engine float drift sneaks in, and the basis-point/int64 pattern
here is the template the repo uses to keep Python extensions differential-
testable at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from ..sources.tables import load_table, spread_small_scan

# DataType instances, not DDL strings: string returnTypes are parsed through
# the active SparkContext at decoration time, which breaks the registry's
# eager session-free import.
_TOKEN_ROW = StructType(
    [StructField("token", StringType()), StructField("n", LongType())]
)


@pandas_udf(DoubleType())
def _weighted_discount(disc_bp: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted mean discount from exact basis points.

    int64 sums are exact (bp <= 1000, qty <= 50 ⇒ no overflow until ~1e14
    rows per group); the two closing float divisions are IEEE-identical in
    any engine, so the result is bit-stable across Spark partitionings AND
    vs the DuckDB oracle — no rounding slop needed.
    """
    num = int((disc_bp * qty).sum())
    den = int(qty.sum())
    return float(num) / float(den) / 10000.0


@pandas_udf(LongType())
def _total_qty(qty: pd.Series) -> int:
    return int(qty.sum())


def udaf_weighted_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    prep = li.select(
        "l_returnflag",
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("disc_bp"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    # Catalyst refuses to mix grouped-agg pandas UDFs with JVM aggregates in
    # one Aggregate (INVALID_PANDAS_UDF_PLACEMENT), so the companion count
    # is a second pandas UDAF rather than F.sum.
    return prep.groupBy("l_returnflag").agg(
        _weighted_discount("disc_bp", "qty").alias("w_avg_discount"),
        _total_qty("qty").alias("total_qty"),
    )


UDAF_WEIGHTED_DISCOUNT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 10000.0 AS w_avg_discount,
       -- cast back down: DuckDB promotes SUM(BIGINT) to HUGEINT, which
       -- pandas renders as float64 and the strict dtype compare rejects
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_returnflag
"""


@udtf(returnType=_TOKEN_ROW)
class _HeavyTokens:
    """Tokens occurring >= 8 times in one document (0..k rows per input
    row — the variable-cardinality shape only a table function expresses).
    Tokenization is a literal single-space split to mirror the oracle's
    ``string_split(text, ' ')`` exactly."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        counts: dict[str, int] = {}
        for tok in text.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
        for tok, n in counts.items():
            if n >= 8:
                yield tok, n


def udtf_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("heavy_tokens", _HeavyTokens)
    # spread: the UDTF's per-row eval runs before any exchange; a one-file
    # scan would serialize it into a single Python task (guide §2.5).
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return spark.sql(
        "SELECT d.doc_id, t.token, t.n FROM {documents} d, LATERAL heavy_tokens(d.text) t",
        documents=docs,
    )


UDTF_HEAVY_TOKENS_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
)
SELECT doc_id, token, COUNT(*) AS n
FROM toks GROUP BY doc_id, token HAVING COUNT(*) >= 8
"""


UDF_SURFACE_QUERIES: dict[str, tuple] = {
    "rel_udaf_weighted_discount": (udaf_weighted_discount, UDAF_WEIGHTED_DISCOUNT_SQL),
    "rel_udtf_heavy_tokens": (udtf_heavy_tokens, UDTF_HEAVY_TOKENS_SQL),
}
