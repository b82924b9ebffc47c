"""Similarity search over the ``embeddings`` table (north-star §2c).

Two paths, per the 100 TB design brief:

- **brute-force top-k** — the exact baseline: broadcast the (small) query
  set against the full vector table, JVM-side double dot products
  (``F.zip_with`` + ``F.aggregate``, no Python), per-query top-k via a
  window. Scales as |queries| x |corpus|: the corpus side stays partitioned,
  the query side broadcasts, so there is no shuffle of the big table at all.
- **LSH-bucketed ANN** — random-hyperplane signatures (4 tables x 8 bits,
  planes derived deterministically from xxhash64 so both the signature and
  the result are reproducible), bucket-join candidates, exact re-rank of
  candidates only. Recall < 1 by construction -> rows-only driver check;
  recall against the brute-force baseline is pinned in unit tests.

Cosines are computed in double with sequential index-order accumulation on
both engines, making the top-k ranking hash-stable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.tables import load_table

TOP_K = 10
N_QUERIES = 8         # query set = vec_id < 8
# 8 tables x 4 bits: tuned for high-dimensional *random* vectors (LSH's
# adversarial case — real embedding corpora cluster and need fewer probes).
# Per-bit collision prob for a cos~0.4 neighbor is ~0.63, so a 4-bit bucket
# matches with p~0.16 and 8 independent tables give ~75% top-k recall while
# each table's bucket fan-out (2^4) still bounds the candidate scan.
LSH_TABLES = 8
LSH_BITS = 4          # bits (hyperplanes) per table


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col("e"), F.col("e"))))


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for each query vector (vec_id < 8).

    Plan shape: broadcast-nested-loop join (query side ~KB), evaluated
    entirely in whole-stage codegen; the only shuffle is the final per-query
    window over k * |queries| rows. Self-matches excluded; ties broken by
    neighbor id for determinism.
    """
    corpus = _with_norm(_emb(spark, sf_dir))
    queries = _with_norm(_emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES))
    q = queries.alias("q")
    c = corpus.alias("c")
    cos = _dot(F.col("q.e"), F.col("c.e")) / (F.col("q.norm") * F.col("c.norm"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


SIM_TOPK_BRUTEFORCE_SQL = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS norm FROM v
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
           / (q.norm * c.norm) AS cosine
  FROM n q JOIN n c ON q.vec_id < 8 AND q.vec_id <> c.vec_id
)
SELECT query_id, rank, neighbor_id, cosine
FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
WHERE rank <= 10
"""


def _signatures(df: DataFrame, tables: int = LSH_TABLES, bits: int = LSH_BITS) -> DataFrame:
    """vec_id -> (table_id, bucket) LSH signatures, one row per table.

    Hyperplane t-bit signatures: plane (t, b) component i is a deterministic
    pseudo-random double in [-1, 1) derived from xxhash64(t, b, i); bucket =
    packed sign bits of the plane dot products. Everything is JVM expression
    code — signatures cost one projection over the vector table.

    ``bits`` sets the bucket granularity: expected candidate-pair volume in
    a banding self-join is ~ n^2 * tables / 2^bits, so pair-finding callers
    (dedup prefilter) must scale bits with corpus size (log2(n)) to keep
    candidates O(n), while top-k probing keeps small buckets (the default).

    Planes are materialized ONCE as array literals (one tiny driver-side
    job over tables x bits x dim hash evaluations) instead of re-deriving
    xxhash64 per element per row — the signature projection is then pure
    multiply-accumulate inside codegen. Values and therefore buckets are
    bit-identical to the per-element derivation (equality pinned in
    tests/test_pipeline_ops.py); at 1M x 256-dim x 64 planes this removes
    ~800M hash evaluations from the corpus pass.
    """
    spark = df.sparkSession
    first = df.select(F.size("e").alias("d")).first()
    dim = int(first["d"]) if first is not None else 0
    planes = _plane_literals(spark, tables, bits, dim)

    rows = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for b in range(bits):
            proj = F.aggregate(
                F.zip_with(F.col("e"), F.lit(planes[t][b]), lambda x, p: x * p),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket.bitwiseOR(
                F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), b))
                .otherwise(F.lit(0).cast("long"))
            )
        rows.append(F.struct(F.lit(t).alias("table_id"), bucket.alias("bucket")))
    return df.select(
        "vec_id", "e", "norm", F.explode(F.array(*rows)).alias("sig")
    ).select("vec_id", "e", "norm", "sig.table_id", "sig.bucket")


def _plane_literals(spark: SparkSession, tables: int, bits: int, dim: int):
    """planes[t][b] = the dim-component hyperplane as a Python list.

    Component (t, b, i) = pmod(xxhash64(int t, int b, int i), 100003) /
    50001.5 - 1.0 — computed by the JVM's own xxhash64 in one
    tables*bits*dim-row job so the values (and downstream buckets) are
    bit-identical to deriving them inline per element. Cached per
    (tables, bits, dim) for the session.
    """
    # Values are a pure function of (tables, bits, dim) — the JVM xxhash64
    # is deterministic across sessions — so one flat process-wide cache.
    key = (tables, bits, dim)
    if key in _PLANE_CACHE:
        return _PLANE_CACHE[key]
    per_table = bits * dim
    comp = (
        spark.range(tables * per_table)
        .select(
            (F.col("id") / per_table).cast("int").alias("t"),
            ((F.col("id") % per_table) / dim).cast("int").alias("b"),
            (F.col("id") % dim).cast("int").alias("i"),
        )
        .select(
            "t",
            "b",
            "i",
            (
                F.pmod(F.xxhash64("t", "b", "i"), F.lit(100003)).cast("double")
                / F.lit(50001.5)
                - F.lit(1.0)
            ).alias("v"),
        )
        .collect()
    )
    planes = [[[0.0] * dim for _ in range(bits)] for _ in range(tables)]
    for r in comp:
        planes[r.t][r.b][r.i] = r.v
    _PLANE_CACHE[key] = planes
    return planes


_PLANE_CACHE: dict[tuple[int, int, int], list] = {}


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH: bucket-join then exact re-rank.

    The corpus is signed once (LSH_TABLES x LSH_BITS projections/vector,
    one pass) and joined to query
    signatures on (table_id, bucket) — at 100 TB this is the scale path: the
    shuffle moves only (vec_id, bucket) pairs and candidate vectors, never
    the full pairwise space. Probabilistic recall -> rows-only check;
    unit tests pin recall >= 0.5 against the brute-force baseline at sf0.01.
    """
    corpus = _with_norm(_emb(spark, sf_dir))
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    csig = _signatures(corpus)
    qsig = _signatures(queries)
    q = qsig.alias("q")
    c = csig.alias("c")
    candidates = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.table_id") == F.col("c.table_id"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.e").alias("qe"),
            F.col("q.norm").alias("qnorm"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.col("c.e").alias("ce"),
            F.col("c.norm").alias("cnorm"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(F.col("qe"), F.col("ce")) / (F.col("qnorm") * F.col("cnorm"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


IVF_LISTS = 16       # inverted lists (coarse centroids)
IVF_PROBES = 4       # lists probed per query
IVF_KMEANS_ITERS = 3  # Lloyd rounds (fixed count => bounded, reproducible plan)


def _cent_scores(cent_map: dict[int, list[float]]) -> F.Column:
    """Centroids inlined as a literal array<struct(sim, ncid)> scored against
    the row's vector — a NARROW map: no join, no shuffle, evaluated inside
    the corpus scan. ``ncid = -cent_id`` so lexicographic struct ordering
    (sim, then ncid) breaks similarity ties toward the smaller cent_id.
    Centroid norms are driver-computed floats (ranking only, k x dim cells).
    """
    import math

    entries = []
    for cid, vec in sorted(cent_map.items()):
        cnorm = math.sqrt(sum(x * x for x in vec))
        sim = _dot(F.col("e"), F.lit(vec)) / (F.col("norm") * F.lit(cnorm))
        entries.append(F.struct(sim.alias("sim"), F.lit(-cid).alias("ncid")))
    return F.array(*entries)


def _ivf_centroids(spark: SparkSession, corpus: DataFrame) -> dict[int, list[float]]:
    """Spherical k-means centroids: deterministic seeding + fixed Lloyd rounds.

    Seeds = the IVF_LISTS lowest-id corpus vectors (order-independent, no
    RNG). Each round assigns every corpus vector to its max-cosine centroid
    via the narrow :func:`_cent_scores` map, then recomputes centroids as
    per-dimension means with a (cent_id, dim)-keyed aggregate — only
    IVF_LISTS x dim distinct keys, so map-side combine shrinks the shuffle
    to ~k*dim rows per partition regardless of corpus size. k is a CONSTANT,
    so the per-round collect is k x dim cells — the standard k-means shape
    (centroids always fit; the corpus never moves). Empty clusters keep
    their previous centroid. Cosine is scale-invariant, so means need no
    renormalization before max-cosine assignment.

    Float means depend on partial-aggregation order (bit-level only); IVF is
    probabilistic-recall territory and stays a rows-only check regardless.
    """
    seeds = (
        corpus.filter(F.col("vec_id") < IVF_LISTS)
        .select(F.col("vec_id").alias("cent_id"), F.col("e").alias("ce"))
        .collect()
    )
    cent_map = {int(r.cent_id): [float(x) for x in r.ce] for r in seeds}
    for _ in range(IVF_KMEANS_ITERS):
        # Two-step select: field extraction on the resolved `best` attribute
        # (extracting from the raw array_max expression in the same select as
        # a generator mis-resolves the struct field names).
        means = (
            corpus.select(F.array_max(_cent_scores(cent_map)).alias("best"), "e")
            .select(
                (-F.col("best")["ncid"]).alias("cent_id"),
                F.posexplode("e").alias("pos", "x"),
            )
            .groupBy("cent_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cent: dict[int, dict[int, float]] = {}
        for r in means:
            by_cent.setdefault(int(r.cent_id), {})[int(r.pos)] = float(r.m)
        for cid, dims in by_cent.items():
            cent_map[cid] = [dims[i] for i in range(len(dims))]
    return cent_map


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via IVF (inverted-file) coarse quantization.

    The other classic ANN scale path next to LSH: build IVF_LISTS coarse
    centroids with deterministic-seeded spherical k-means
    (:func:`_ivf_centroids`), assign every corpus vector to its max-cosine
    list, then search each query only in its IVF_PROBES closest lists with
    exact re-ranking.

    At 100 TB: k-means costs IVF_KMEANS_ITERS narrow passes + combiner
    aggregations over the corpus; final list assignment is a narrow map
    (centroid literals evaluated inside the scan — zero shuffle); the
    candidate join broadcasts the ~|queries| x IVF_PROBES probe rows, so the
    corpus is never shuffled and query cost scales with
    corpus/IVF_LISTS * IVF_PROBES instead of the full corpus.
    Probabilistic recall -> rows-only check; recall floor pinned in tests.
    """
    corpus = _with_norm(_emb(spark, sf_dir))
    cent_map = _ivf_centroids(spark, corpus)
    scores = _cent_scores(cent_map)

    # Corpus: argmax list, narrow (no shuffle of the big side).
    assigned = corpus.withColumn("cent_id", (-F.array_max(scores)["ncid"]).cast("int"))
    # Queries: top-IVF_PROBES lists each — struct sort is (sim asc, ncid
    # asc); reversed gives sim desc with smaller cent_id first on ties.
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    probed = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("norm").alias("qnorm"),
            F.slice(F.reverse(F.array_sort(scores)), 1, IVF_PROBES).alias("top"),
        )
        # two-step select: extract fields from the resolved `top` attribute
        # (generator + unresolved struct access in one select mis-resolves)
        .select(
            "query_id",
            "qe",
            "qnorm",
            F.explode(
                F.transform("top", lambda s: (-s["ncid"]).cast("int"))
            ).alias("cent_id"),
        )
    )
    cand = (
        F.broadcast(probed).join(assigned, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "qe", "qnorm",
            F.col("vec_id").alias("neighbor_id"),
            F.col("e").alias("ce2"),
            F.col("norm").alias("cnorm2"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(F.col("qe"), F.col("ce2")) / (F.col("qnorm") * F.col("cnorm2"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def build_ivf_index(spark: SparkSession, corpus: DataFrame, path: str) -> None:
    """Persist an IVF index: centroids + the corpus PARTITIONED BY LIST.

    Train-once / query-many is the real IVF deployment shape — k-means over
    100 TB is a build-time cost, not a per-query one. The layout IS the
    index: ``{path}/lists/cent_id=K/`` holds exactly list K's vectors, so a
    probe becomes parquet partition pruning — a query that probes 4 of 16
    lists physically reads 1/4 of the corpus bytes, no filter execution
    needed (pinned: the cent_id predicate lands in PartitionFilters, and at
    1000 lists a probe reads 0.4% of the corpus). Centroids are a tiny
    parquet (k rows) loaded driver-side at query time, same as training.

    ``corpus`` must carry (vec_id, embedding) or (vec_id, e).
    """
    if "e" not in corpus.columns:
        corpus = corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    corpus = _with_norm(corpus.select("vec_id", "e"))
    cent_map = _ivf_centroids(spark, corpus)
    cent_rows = [(cid, vec) for cid, vec in sorted(cent_map.items())]
    spark.createDataFrame(
        cent_rows, "cent_id INT, ce ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = corpus.withColumn(
        "cent_id", (-F.array_max(_cent_scores(cent_map))["ncid"]).cast("int")
    )
    assigned.write.mode("overwrite").partitionBy("cent_id").parquet(f"{path}/lists")


def sim_topk_ivf_index(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    probes: int = IVF_PROBES,
    k: int = TOP_K,
) -> DataFrame:
    """ANN top-k against a persisted :func:`build_ivf_index` index.

    Per query batch: load centroids (k×dim cells, driver-side), rank each
    query's ``probes`` closest lists with the same narrow literal-centroid
    map as training, then read ONLY those lists from the index — the
    ``cent_id IN (...)`` predicate is a partition filter, so unprobed lists
    are never scanned — and exact-re-rank the candidates. The probed-query
    side broadcasts; the index side is never shuffled.

    ``queries`` must carry (vec_id, embedding) or (vec_id, e).
    """
    if "e" not in queries.columns:
        queries = queries.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    queries = _with_norm(queries.select("vec_id", "e"))
    cent_map = {
        int(r.cent_id): [float(x) for x in r.ce]
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    scores = _cent_scores(cent_map)
    probed = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("norm").alias("qnorm"),
            F.slice(F.reverse(F.array_sort(scores)), 1, probes).alias("top"),
        )
        .select(
            "query_id", "qe", "qnorm",
            F.explode(
                F.transform("top", lambda s: (-s["ncid"]).cast("int"))
            ).alias("cent_id"),
        )
    )
    probed_lists = [
        int(r.cent_id) for r in probed.select("cent_id").distinct().collect()
    ]
    lists = spark.read.parquet(f"{path}/lists").where(
        F.col("cent_id").isin(probed_lists)
    )
    cand = (
        F.broadcast(probed).join(lists, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "qe", "qnorm",
            F.col("vec_id").alias("neighbor_id"),
            F.col("e").alias("ce2"),
            F.col("norm").alias("cnorm2"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(F.col("qe"), F.col("ce2")) / (F.col("qnorm") * F.col("cnorm2"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# --- deterministic quantized k-means (trained clustering) -----------------

KMEANS_K = 8
KMEANS_ITERS = 3
# Quantization: q[i] = round((x[i] + SHIFT) * SCALE). SHIFT keeps every
# coordinate positive (embedding components are well inside (-1, 1)), so
# every per-dimension sum is positive and integer division truncates and
# floors identically — Spark's `div` truncates toward zero while DuckDB's
# `//` floors, and they agree only on non-negative operands. Distances are
# shift-invariant, so the clustering is unaffected.
KMEANS_SHIFT = 1.0
KMEANS_SCALE = 1_000_000


def _emb_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "e",
            lambda x: F.round((x + KMEANS_SHIFT) * KMEANS_SCALE).cast("bigint"),
        ).alias("q"),
    )


def kmeans_quantized(
    spark: SparkSession,
    vecs: DataFrame,
    k: int = KMEANS_K,
    iterations: int = KMEANS_ITERS,
) -> DataFrame:
    """Lloyd's k-means over micro-quantized vectors, every step in exact
    BIGINT arithmetic so a fixed-iteration run is bit-reproducible across
    engines (the IVF router's centroids are an untrained grid; this is the
    TRAINED counterpart — corpus clustering, partition design, codebook
    learning). Deterministic throughout: init = the k lowest vec_ids,
    assignment argmin breaks ties on the lower centroid id, centroid
    update is an order-free integer sum + floor division.

    Scale: centroids are k rows and broadcast into the assignment join
    (never the corpus); the update is a posexplode to (vec, dim) rows with
    map-side partial sums keyed on (cluster, dim) — k·dim result rows —
    then regrouped to arrays via a sort-fixed collect bounded by dim.
    The corpus shuffles once per iteration on a uniform key; nothing is
    ever collected to the driver.

    ``vecs``: (vec_id, q array<bigint>). Returns
    (vec_id, cluster_id, dist_sq) after ``iterations`` assignments.
    """
    dist = F.aggregate(
        F.zip_with(F.col("q"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w_init = W.orderBy("vec_id")
    cent = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).cast("int").alias("cid"),
            F.col("q").alias("c"),
        )
    )
    assign = None
    for _ in range(iterations):
        scored = vecs.join(F.broadcast(cent), how="cross").select(
            "vec_id",
            "q",
            F.struct(dist.alias("dist_sq"), F.col("cid")).alias("dc"),
        )
        assign = (
            scored.groupBy("vec_id")
            .agg(F.min("dc").alias("best"), F.first("q").alias("q"))
            .select(
                "vec_id",
                "q",
                F.col("best.cid").alias("cluster_id"),
                F.col("best.dist_sq").alias("dist_sq"),
            )
        )
        dims = assign.select(
            "cluster_id", F.posexplode("q").alias("dim", "val")
        )
        cent = (
            dims.groupBy("cluster_id", "dim")
            .agg(F.expr("sum(val) div count(*)").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
            )
            .select(
                F.col("cluster_id").alias("cid"),
                F.transform("dm", lambda s: s["m"]).alias("c"),
            )
        )
    return assign.select("vec_id", "cluster_id", "dist_sq")


def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized k-means over the embeddings corpus
    (:func:`kmeans_quantized`, k = 8, 3 Lloyd iterations)."""
    return kmeans_quantized(spark, _emb_quantized(spark, sf_dir))


def _kmeans_sql(k: int, iterations: int) -> str:
    """Unrolled Lloyd oracle. Every per-iteration CTE is MATERIALIZED —
    each is referenced by both the next assignment and the next centroid
    update, so plain inlining would double the chain per iteration."""
    parts = [
        f"""WITH kv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round((x + {KMEANS_SHIFT!r}) * {KMEANS_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
kc0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, q AS c
  FROM (SELECT vec_id, q FROM kv ORDER BY vec_id LIMIT {k})
)"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
ka{t} AS MATERIALIZED (
  SELECT vec_id, q, cid AS cluster_id, dist_sq FROM (
    SELECT v.vec_id, v.q, c.cid,
           list_sum(list_transform(range(1, len(v.q) + 1),
                    i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS dist_sq,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(range(1, len(v.q) + 1),
                      i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))), c.cid) AS rk
    FROM kv v CROSS JOIN kc{t - 1} c)
  WHERE rk = 1
),
kc{t} AS MATERIALIZED (
  SELECT cluster_id AS cid, list(m ORDER BY dim) AS c FROM (
    SELECT a.cluster_id, d.dim, SUM(a.q[d.dim]) // COUNT(*) AS m
    FROM ka{t} a
    CROSS JOIN (SELECT UNNEST(range(1, {{dim}} + 1)) AS dim) d
    GROUP BY a.cluster_id, d.dim)
  GROUP BY cluster_id
)"""
        )
    parts.append(
        # list_sum returns DOUBLE in DuckDB; the values are exact integers
        # (max 64 * (2e6)^2 ≈ 2.6e14 < 2^53) so the BIGINT cast is lossless
        f"""
SELECT vec_id, cluster_id, CAST(dist_sq AS BIGINT) AS dist_sq FROM ka{iterations}"""
    )
    return "\n".join(parts)


# dim read once from the table shape at registration time would couple the
# SQL to testdata; 64 is the embeddings schema constant (TESTDATA.md).
SIM_KMEANS_SQL = _kmeans_sql(KMEANS_K, KMEANS_ITERS).replace("{dim}", "64")


SIMILARITY_QUERIES: dict[str, tuple] = {
    "sim_topk_bruteforce": (sim_topk_bruteforce, SIM_TOPK_BRUTEFORCE_SQL),
    "sim_topk_lsh": (sim_topk_lsh, None),
    "sim_topk_ivf": (sim_topk_ivf, None),
    # staged round-8 rotation stock (declared r07,
    # registry.STAGED_DECLARED_ROUND)
    "sim_kmeans": (sim_kmeans, SIM_KMEANS_SQL),
}


def random_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    seed: int = 1,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: map ``vec_col``
    (array<float/double>, any input dim) to ``out_dim`` Gaussian-projected
    coordinates scaled by 1/sqrt(out_dim), preserving pairwise Euclidean
    distances within (1±eps) for eps ~ sqrt(8 ln n / out_dim) — the
    standard pre-ANN dimensionality reduction when the raw embedding width
    makes exact distance work too expensive.

    Executed as an Arrow ``mapInPandas`` batch matmul: the projection
    matrix is regenerated INSIDE each task from the deterministic seed
    (``numpy.random.default_rng(seed)``, out_dim × in_dim float64 — a few
    MB even at 4096 input dims), so nothing is broadcast or shuffled and
    the operator is a pure narrow map over the corpus; per-batch work is
    one vectorized (batch × in_dim) @ (in_dim × out_dim) product. Output:
    (``id_col``, projected array<double>).
    """
    import pandas as pd  # noqa: F401 — worker-side import check

    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    src = df.select(
        F.col(id_col).alias("_rp_id"),
        F.col(vec_col).cast("array<double>").alias("_rp_vec"),
    )

    def _batches(it):
        import numpy as np

        planes = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["_rp_vec"].tolist(), dtype=np.float64)
            in_dim = mat.shape[1]
            if in_dim not in planes:
                rng = np.random.default_rng(seed)
                planes[in_dim] = rng.standard_normal((in_dim, out_dim))
            proj = mat @ planes[in_dim] / np.sqrt(out_dim)
            out = pdf[["_rp_id"]].copy()
            out["projected"] = list(proj)
            yield out

    # Derive the id field's type from the input schema: a non-integral id
    # (e.g. a string doc key) would pass the select but fail at Arrow
    # conversion inside the job if "long" were hardcoded here.
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("_rp_id", df.schema[id_col].dataType),
            StructField("projected", ArrayType(DoubleType())),
        ]
    )
    return (
        src.mapInPandas(_batches, out_schema)
        .select(F.col("_rp_id").alias(id_col), "projected")
    )
