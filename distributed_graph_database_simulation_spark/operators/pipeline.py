"""Training-data pipeline operators over ``documents`` (north-star §2c).

The two ops here are the corpus-preparation steps that sit between the
text-analysis scoring pass and the dedup pass in an LLM data pipeline:

- **chunking** — split every document into overlapping fixed-width token
  windows (the pretraining "context window packing" precursor). Pure
  narrow expression code: one ``split`` + per-row ``sequence`` +
  ``explode`` + ``slice``; no shuffle, no Python. Emits ``md5`` of each
  chunk so the differential compare pins exact chunk contents without
  hauling full text through the driver (same trick as
  ``text_analysis.pii_scrub_df``).
- **stratified sampling** — deterministic per-language downsampling via a
  Knuth multiplicative hash on ``doc_id`` (public constant 2654435761 =
  floor(2^32/phi)). Engine-portable integer arithmetic, so the DuckDB
  oracle reproduces the exact sample; no ``rand()``, which would be
  unverifiable and non-reproducible across retries — determinism is the
  property a 100 TB pipeline needs for resumable runs.

Scale posture: both are single narrow projections (filter/explode) over
the corpus — embarrassingly parallel, zero Exchange; chunk fan-out is
bounded by doc length / STRIDE per row, so partition sizes stay
proportional to input bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread_small_scan

CHUNK = 64  # tokens per chunk
STRIDE = 48  # tokens between chunk starts (CHUNK - STRIDE = 16 overlap)

# floor(2^32 / golden_ratio) — Knuth's multiplicative hashing constant.
_KNUTH = 2654435761
_BUCKETS = 1_000_000

# Per-language keep rates in parts-per-million. Rebalances the corpus
# toward the low-resource languages (keep all de/zh, downsample en most).
SAMPLE_PPM: dict[str, int] = {
    "de": 1_000_000,
    "en": 300_000,
    "es": 700_000,
    "fr": 500_000,
    "zh": 1_000_000,
}


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    # spread: one-file corpus -> one scan partition; BPE/shingle passes
    # before the first exchange would run single-task (guide §2.5).
    # spread=False (r16, r15 verdict #6): entries whose pre-exchange work is
    # a trivial projection (interleave/pack/diff — the heavy lifting happens
    # after their first hash exchange anyway) opt out; for them the added
    # round-robin exchange was a pure ~0.2 s tax in the driver's r15 bench.
    docs = load_table(spark, sf_dir, "documents")
    return spread_small_scan(docs) if spread else docs


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_windows_df(_docs(spark, sf_dir))


def chunk_windows_df(docs: DataFrame) -> DataFrame:
    """Overlapping token-window chunking: windows of ``CHUNK`` whitespace
    tokens every ``STRIDE`` tokens; the last window is the ragged tail.

    n_chunks = 1 for n <= CHUNK else ceil((n - CHUNK) / STRIDE) + 1, in
    integer arithmetic (``floor((n - CHUNK + STRIDE - 1) / STRIDE) + 1``)
    so both engines compute the identical count.
    """
    words = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
    n = F.size("w")
    n_chunks = F.when(n <= CHUNK, F.lit(1)).otherwise(
        (F.floor((n - CHUNK + STRIDE - 1) / STRIDE) + 1).cast("int")
    )
    base = docs.select("doc_id", words.alias("w"))
    # sequence() materializes [0..n_chunks-1] per row; explode is the only
    # fan-out. slice() is 1-based and clamps at the array end, exactly like
    # DuckDB list slicing.
    exploded = base.select(
        "doc_id", "w", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    )
    chunk = F.slice("w", F.col("chunk_id") * STRIDE + 1, CHUNK)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        F.size(chunk).alias("n_tokens"),
    )


TEXT_CHUNK_WINDOWS_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
dims AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= {CHUNK} THEN 1
              ELSE CAST((len(w) - {CHUNK} + {STRIDE - 1}) // {STRIDE} AS INT) + 1
         END AS n_chunks
  FROM docs
),
exploded AS (
  SELECT doc_id, w, CAST(UNNEST(range(n_chunks)) AS INT) AS chunk_id FROM dims
)
SELECT doc_id, chunk_id,
       md5(array_to_string(w[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK}], ' ')) AS chunk_md5,
       CAST(len(w[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK}]) AS INT) AS n_tokens
FROM exploded
"""


CDC_GRAM = 4  # rolling window width (tokens) for the boundary hash
CDC_MASK_HEX = "0"  # boundary iff md5(gram) starts with this -> P = 1/16


def cdc_chunks_df(docs: DataFrame) -> DataFrame:
    """Content-defined chunking (the FastCDC/Rabin family, token
    granularity): a chunk boundary falls AFTER token position p whenever
    the hash of the trailing ``CDC_GRAM``-token window at p starts with
    ``CDC_MASK_HEX`` (P = 1/16 → mean chunk ≈ 16 tokens). Unlike the
    fixed-stride :func:`chunk_windows_df`, boundaries move WITH the
    content: inserting one token near the start of a document shifts
    every fixed-stride chunk but leaves all content-defined chunks after
    the insertion identical — the property dedup storage and incremental
    pipelines rely on (pinned in tests).

    md5 is the boundary hash because it is engine-portable (DuckDB's
    ``hash()`` is engine-specific); the first hex nibble gives the 1/16
    gate. Chunks are contiguous by construction, so each chunk's text is
    re-cut from the document array by (start, length) — no
    order-sensitive string aggregation anywhere.

    Scale: the boundary-flag array is one narrow HOF ``transform`` per
    document (no explode for hashing); the only shuffles are the doc_id
    window for the running boundary count and the doc_id-keyed join that
    cuts chunk text — both uniform keys. Chunk fan-out is bounded by
    document length.

    Returns (doc_id, chunk_id, start_pos, n_tokens, chunk_md5).
    """
    from pyspark.sql import Window

    words = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
    base = docs.select("doc_id", words.alias("w"))
    flags = F.transform(
        F.sequence(F.lit(1), F.size("w")),
        lambda p: F.when(
            (p >= CDC_GRAM)
            & (
                F.substring(
                    F.md5(F.array_join(F.slice("w", p - CDC_GRAM + 1, CDC_GRAM), " ")),
                    1,
                    1,
                )
                == CDC_MASK_HEX
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    pos_flags = base.select(
        "doc_id", F.posexplode(flags).alias("pos0", "is_boundary")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "is_boundary")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = pos_flags.select(
        "doc_id",
        "pos",
        F.coalesce(F.sum("is_boundary").over(w_prev), F.lit(0))
        .cast("int")
        .alias("chunk_id"),
    )
    spans = chunked.groupBy("doc_id", "chunk_id").agg(
        F.min("pos").cast("int").alias("start_pos"),
        F.count("*").cast("int").alias("n_tokens"),
    )
    return spans.join(base, "doc_id").select(
        "doc_id",
        "chunk_id",
        "start_pos",
        "n_tokens",
        F.md5(
            F.array_join(F.slice("w", F.col("start_pos"), F.col("n_tokens")), " ")
        ).alias("chunk_md5"),
    )


def pipe_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over the documents corpus
    (:func:`cdc_chunks_df`)."""
    return cdc_chunks_df(_docs(spark, sf_dir))


PIPE_CDC_CHUNKS_SQL = f"""
WITH lists AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS ws
  FROM documents
),
flags AS (
  SELECT doc_id,
         UNNEST(range(1, len(ws) + 1)) AS pos,
         UNNEST(list_transform(range(1, len(ws) + 1), p ->
           CASE WHEN p >= {CDC_GRAM}
                 AND substr(md5(array_to_string(ws[p - {CDC_GRAM} + 1 : p], ' ')), 1, 1)
                     = '{CDC_MASK_HEX}'
                THEN 1 ELSE 0 END)) AS is_boundary
  FROM lists
),
chunked AS (
  SELECT doc_id, pos,
         CAST(COALESCE(SUM(is_boundary) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS chunk_id
  FROM flags
),
spans AS (
  SELECT doc_id, chunk_id,
         CAST(MIN(pos) AS INT) AS start_pos,
         CAST(COUNT(*) AS INT) AS n_tokens
  FROM chunked GROUP BY 1, 2
)
SELECT s.doc_id, s.chunk_id, s.start_pos, s.n_tokens,
       md5(array_to_string(l.ws[s.start_pos : s.start_pos + s.n_tokens - 1], ' '))
         AS chunk_md5
FROM spans s JOIN lists l ON l.doc_id = s.doc_id
"""


def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_stratified_df(_docs(spark, sf_dir))


def sample_stratified_df(docs: DataFrame) -> DataFrame:
    """Deterministic stratified sample: keep doc iff
    ``(doc_id * KNUTH) % 1e6 < SAMPLE_PPM[lang]``. Unknown languages are
    kept (rate 1.0) — dropping data silently on a new label is the wrong
    default for a pipeline."""
    bucket = F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_BUCKETS))
    rate = F.lit(_BUCKETS)
    for lang, ppm in sorted(SAMPLE_PPM.items()):
        rate = F.when(F.col("lang") == lang, F.lit(ppm)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", bucket.alias("sample_bucket"))
        .where(F.col("sample_bucket") < rate)
        .select("doc_id", "lang", F.col("sample_bucket").cast("bigint").alias("sample_bucket"))
    )


_RATE_CASES = "\n".join(
    f"            WHEN lang = '{lang}' THEN {ppm}"
    for lang, ppm in sorted(SAMPLE_PPM.items())
)

TEXT_SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, CAST((doc_id * {_KNUTH}) % {_BUCKETS} AS BIGINT) AS sample_bucket
FROM documents
WHERE (doc_id * {_KNUTH}) % {_BUCKETS} <
      CASE
{_RATE_CASES}
            ELSE {_BUCKETS} END
"""


N_SHARDS = 16
# xxHash32 prime 2 — a second public multiplicative constant, independent of
# _KNUTH so shard id and within-shard order are decorrelated.
_XXPRIME = 2246822519
_ORDER_MOD = 1_000_003  # prime modulus for the within-shard scramble key
# Sub-buckets per shard: the expensive rank/sort runs per (shard, sub), so
# sort parallelism is N_SHARDS * N_SUB tasks, not N_SHARDS. Raise for bigger
# clusters — output positions are invariant to N_SUB (range bucketing on the
# sort key keeps the global order identical).
N_SUB = 64
_SUB_WIDTH = -(-_ORDER_MOD // N_SUB)  # ceil(mod / N_SUB): sub monotone in scramble


def text_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_assign_df(_docs(spark, sf_dir))


def shard_assign_df(docs: DataFrame, epoch: int = 0) -> DataFrame:
    """Deterministic training-data layout: assign every doc to one of
    ``N_SHARDS`` shards and give it a stable pseudo-random position within
    the shard (the dataloader read order).

    This is the write-side ``repartition(N).sortWithinPartitions(...)``
    layout step of a 100 TB pipeline, expressed verifiably: shard =
    multiplicative hash of doc_id, position = dense rank over a second,
    independent hash (doc_id tie-break makes the total order unique, so
    the output is reproducible run-to-run and engine-to-engine — the
    property that makes checkpoint-resume of a training run possible).

    ``epoch`` re-shuffles the within-shard order per training epoch with an
    additive salt on the scramble key — each epoch's order is decorrelated
    from the last yet fully deterministic (epoch 0 is the historical
    layout, bit-for-bit). Shard membership is epoch-invariant by design:
    only the read order changes, so shard files written once serve every
    epoch.

    Scale: a naive ``row_number() over (partition by shard)`` caps rank
    parallelism at N_SHARDS tasks (~6 TB/task at 100 TB). Instead the
    scramble key is range-bucketed into ``N_SUB`` sub-buckets — monotone in
    the sort key, so dense per-shard positions are unchanged — the rank runs
    per (shard, sub) over N_SHARDS * N_SUB tasks, and a broadcast cumulative
    offset (one tiny N_SHARDS*N_SUB-row aggregate) recomposes global
    positions. Two Exchanges over the corpus (rank keys + count agg), both
    on uniform hash keys; no global sort anywhere.
    """
    from pyspark.sql import Window

    shard = F.pmod(F.col("doc_id") * _XXPRIME, F.lit(N_SHARDS)).cast("int")
    # epoch salt: additive in the multiplier so epoch 0 reduces exactly to
    # (doc_id * KNUTH) % mod; distinct epochs permute the order independently
    mult = _KNUTH + epoch * _XXPRIME
    if mult % _ORDER_MOD == 0:  # degenerate multiplier (1-in-1e6 epochs)
        mult += 1
    scramble = F.pmod(F.col("doc_id") * mult, F.lit(_ORDER_MOD))
    keyed = docs.select(
        "doc_id", shard.alias("shard"), scramble.alias("scramble")
    ).withColumn("sub", F.expr(f"scramble div {_SUB_WIDTH}").cast("int"))
    w_rank = Window.partitionBy("shard", "sub").orderBy("scramble", "doc_id")
    ranked = keyed.withColumn("rn", F.row_number().over(w_rank))
    # Per-(shard, sub) counts -> cumulative start offset of each sub-bucket.
    # The window here runs over <= N_SHARDS * N_SUB aggregate rows — trivial.
    w_off = (
        Window.partitionBy("shard")
        .orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        keyed.groupBy("shard", "sub")
        .agg(F.count("*").alias("cnt"))
        .withColumn("offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select("shard", "sub", "offset")
    )
    return (
        ranked.join(F.broadcast(offsets), ["shard", "sub"])
        .select(
            "doc_id",
            "shard",
            (F.col("offset") + F.col("rn") - 1).cast("bigint").alias("pos"),
        )
    )


TEXT_SHARD_ASSIGN_SQL = f"""
SELECT doc_id,
       CAST((doc_id * {_XXPRIME}) % {N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
              PARTITION BY (doc_id * {_XXPRIME}) % {N_SHARDS}
              ORDER BY (doc_id * {_KNUTH}) % {_ORDER_MOD}, doc_id
            ) - 1 AS BIGINT) AS pos
FROM documents
"""


def prepare_training_corpus(
    spark: SparkSession, sf_dir: str, min_quality: float = 0.5,
    scrub_spans: bool = False,
) -> DataFrame:
    """The composed end-to-end corpus-preparation flow a training-data user
    actually runs, built entirely from this repo's certified operators:

        quality filter [-> duplicated-span scrub] -> exact dedup
        -> near-dup cluster dedup -> stratified sample
        -> shard + position assignment

    With ``scrub_spans=True`` the substring-level pass
    (:func:`~.dedup.scrub_dup_spans_df`) runs after the quality gate:
    boilerplate shared across surviving docs is excised BEFORE document-
    level dedup, so two docs that differ only by injected boilerplate
    collapse into one exact-dup group instead of surviving as "distinct".

    Returns (doc_id, lang, quality, shard, pos) — one row per surviving
    document, deterministically placed for a resumable dataloader.

    Composition semantics worth naming:

    - Quality runs FIRST, so dedup clusters form over the quality-passing
      corpus (``dedup_clusters_df`` on the filtered frame): a low-quality
      copy cannot become a cluster's survivor and drag the cluster down.
    - Exact dedup keeps ``survivor_id`` (min doc_id per content hash);
      identical texts share a quality score, so the filter order cannot
      split an exact-dup group.
    - Sampling and sharding are the deterministic hash-keyed steps — the
      composed output is reproducible run-to-run, which is what makes a
      checkpoint-resumed training job read the same shards.

    Scale: each stage is one of the already-audited plans (narrow scoring,
    hash-agg dedup, bucketed LSH + tiny closure loop, narrow sample,
    (shard, sub)-parallel rank); composition adds only doc_id semi/anti
    joins, which broadcast on the small side or hash on uniform keys.
    """
    from .dedup import dedup_clusters_df, dedup_exact, scrub_dup_spans_df
    from .text_analysis import quality_score_df

    docs = _docs(spark, sf_dir)
    quality = quality_score_df(docs).select("doc_id", "quality")
    passing = docs.join(
        quality.where(F.col("quality") >= min_quality).select("doc_id"), "doc_id"
    )
    if scrub_spans:
        # Substring-level pass over the quality-passing corpus; exact dedup
        # must then hash the SCRUBBED text, so it runs inline on this frame
        # (same md5-of-normalized-text groupBy as dedup_exact).
        passing = (
            scrub_dup_spans_df(passing)
            .select("doc_id", "text")
            .join(passing.drop("text"), "doc_id")
        )
        exact = (
            passing.select(
                "doc_id", F.md5(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).alias("h")
            )
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        exact_survivors = passing.join(exact.select("doc_id"), "doc_id", "left_semi")
    else:
        exact_survivors = passing.join(
            dedup_exact(spark, sf_dir).select(F.col("survivor_id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )
    near_dup_losers = (
        dedup_clusters_df(spark, exact_survivors)
        .where(~F.col("is_survivor"))
        .select("doc_id")
    )
    unique_docs = exact_survivors.join(near_dup_losers, "doc_id", "left_anti")
    sampled = sample_stratified_df(unique_docs).select("doc_id", "lang")
    placed = shard_assign_df(sampled)
    return (
        placed.join(sampled, "doc_id")
        .join(quality, "doc_id")
        .select("doc_id", "lang", "quality", "shard", "pos")
    )


SEQ_LEN = 2048  # tokens per packed training sequence


def pack_sequences_df(
    chunks: DataFrame, seq_len: int = SEQ_LEN, epoch: int = 0
) -> DataFrame:
    """Concat-and-split sequence packing: lay chunks end-to-end in a
    deterministic pseudo-random order and cut every ``seq_len`` tokens —
    the standard GPT-style packed-dataloader layout (a chunk whose tokens
    straddle a cut simply continues in the next sequence; no padding waste
    except the final ragged sequence per shard).

    Input: any frame with ``(doc_id, chunk_id, n_tokens)`` — e.g. the
    output of :func:`chunk_windows_df`. Output adds:

    - ``shard`` — same doc-keyed multiplicative hash as
      :func:`shard_assign_df`, so all chunks of a doc pack into one shard
      and a doc's chunks stay adjacent (ordered by ``chunk_id``) within
      the stream;
    - ``seq_id`` — which fixed-length sequence (within the shard) the
      chunk's FIRST token lands in;
    - ``seq_offset`` — token offset of the chunk's first token within that
      sequence (in ``[0, seq_len)``).

    Determinism run-to-run and engine-to-engine is the resumability
    contract (same argument as :func:`shard_assign_df`); ``epoch`` applies
    the same per-epoch order salt (epoch 0 = the historical layout).

    Scale: the packing order needs a per-shard running token total — a
    naive per-shard window caps cumsum parallelism at N_SHARDS tasks, so
    the same range-bucketing trick as :func:`shard_assign_df` applies:
    cumsum runs per (shard, sub) over N_SHARDS * N_SUB tasks, and a
    broadcast per-sub-bucket total (tiny aggregate) recomposes the global
    running sum — valid because ``sub`` is monotone in the scramble order.
    Two corpus Exchanges (window keys + count agg), both uniform hash keys,
    no global sort.
    """
    from pyspark.sql import Window

    shard = F.pmod(F.col("doc_id") * _XXPRIME, F.lit(N_SHARDS)).cast("int")
    # same per-epoch salt as shard_assign_df (epoch 0 = historical layout)
    mult = _KNUTH + epoch * _XXPRIME
    if mult % _ORDER_MOD == 0:
        mult += 1
    scramble = F.pmod(F.col("doc_id") * mult, F.lit(_ORDER_MOD))
    keyed = chunks.select(
        "doc_id", "chunk_id", "n_tokens", shard.alias("shard"), scramble.alias("scramble")
    ).withColumn("sub", F.expr(f"scramble div {_SUB_WIDTH}").cast("int"))
    order = ["scramble", "doc_id", "chunk_id"]
    w_cum = (
        Window.partitionBy("shard", "sub")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_sub = keyed.withColumn(
        "cum_in_sub", F.coalesce(F.sum("n_tokens").over(w_cum), F.lit(0))
    )
    # Per-(shard, sub) token totals -> cumulative start offset per sub-bucket.
    # The window runs over <= N_SHARDS * N_SUB aggregate rows — trivial.
    w_off = (
        Window.partitionBy("shard")
        .orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        keyed.groupBy("shard", "sub")
        .agg(F.sum("n_tokens").alias("tok"))
        .withColumn("offset", F.coalesce(F.sum("tok").over(w_off), F.lit(0)))
        .select("shard", "sub", "offset")
    )
    cum_before = F.col("offset") + F.col("cum_in_sub")
    return (
        in_sub.join(F.broadcast(offsets), ["shard", "sub"])
        .select(
            "doc_id",
            "chunk_id",
            "shard",
            F.floor(cum_before / seq_len).cast("bigint").alias("seq_id"),
            F.pmod(cum_before, F.lit(seq_len)).cast("int").alias("seq_offset"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
        )
    )


def cap_per_source_df(docs: DataFrame, max_per_source: int) -> DataFrame:
    """Per-source admission cap: keep at most ``max_per_source`` documents
    from every ``source``, chosen by a deterministic pseudo-random order —
    the over-represented-domain mitigation every web-scale corpus needs
    (one crawl domain must not dominate the training mixture).

    Which docs survive is decided by rank in (scramble, doc_id) order
    within the source, so the admitted set is reproducible run-to-run and
    independent of partitioning — NOT "first N encountered", which would
    be nondeterministic under Spark's scheduling.

    Scale: a giant source is exactly the skewed-window hazard, so the rank
    reuses the (key, sub) range-bucketing trick from
    :func:`shard_assign_df`: ranks run per (source, sub) over
    |sources| × N_SUB tasks, and a broadcast cumulative per-sub-bucket
    count recomposes the global within-source rank. One corpus Exchange
    for the rank keys + one tiny count aggregate; no global sort.
    """
    from pyspark.sql import Window

    scramble = F.pmod(F.col("doc_id") * _KNUTH, F.lit(_ORDER_MOD))
    keyed = docs.withColumn("_scr", scramble).withColumn(
        "_sub", F.expr(f"_scr div {_SUB_WIDTH}").cast("int")
    )
    w_rank = Window.partitionBy("source", "_sub").orderBy("_scr", "doc_id")
    ranked = keyed.withColumn("_rn", F.row_number().over(w_rank))
    w_off = (
        Window.partitionBy("source")
        .orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        keyed.groupBy("source", "_sub")
        .agg(F.count("*").alias("cnt"))
        .withColumn("_off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select("source", "_sub", "_off")
    )
    return (
        ranked.join(F.broadcast(offsets), ["source", "_sub"])
        .where(F.col("_off") + F.col("_rn") - 1 < max_per_source)
        .select(*docs.columns)
    )


def sample_token_budget_df(
    docs: DataFrame, budgets: dict[str, int]
) -> DataFrame:
    """Token-budget mixture sampling: downsample each language to a target
    TOKEN budget (not a doc-count rate — what a training mixture actually
    specifies). Languages without a budget pass through whole.

    Two jobs: (1) measure per-language token totals — one map-side-combined
    aggregate to |langs| rows, pulled to the driver (tiny by construction);
    (2) convert each budget to a parts-per-million keep rate
    ``min(1, budget / total)`` in integer ppm and admit docs with the same
    Knuth-hash filter as :func:`sample_stratified_df`. Deterministic and
    resumable; the realized token count concentrates around the budget
    (hash sampling is doc-granular — exact-budget packing is what
    :func:`pack_sequences_df` is for downstream).

    Returns ``(doc_id, lang, n_tokens, keep_ppm)`` for admitted docs.
    """
    words = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
    toks = docs.select("doc_id", "lang", F.size(words).alias("n_tokens"))
    return sample_token_budget_counts_df(toks, budgets)


def sample_token_budget_counts_df(
    toks: DataFrame, budgets: dict[str, int]
) -> DataFrame:
    """Budget admission over PROVIDED per-doc token counts
    ``(doc_id, lang, n_tokens)`` — the core of
    :func:`sample_token_budget_df`, factored out so any tokenizer's
    counts (whitespace, BPE) drive the same ppm arithmetic."""
    totals = {
        r["lang"]: r["tok"]
        for r in toks.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    ppm = {
        lang: min(_BUCKETS, (budgets[lang] * _BUCKETS) // total) if total else _BUCKETS
        for lang, total in totals.items()
        if lang in budgets
    }
    rate = F.lit(_BUCKETS)
    for lang, p in sorted(ppm.items()):
        rate = F.when(F.col("lang") == lang, F.lit(p)).otherwise(rate)
    bucket = F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_BUCKETS))
    return (
        toks.withColumn("keep_ppm", rate.cast("int"))
        .where(bucket < F.col("keep_ppm"))
        .select("doc_id", "lang", "n_tokens", "keep_ppm")
    )


def pipe_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag winsorization of lineitem quantity
    (:func:`winsorize_df`, defaults lo=0.01 / hi=0.99).

    l_quantity is an integral-valued double, so the exact interpolated
    percentile arithmetic is IEEE-identical between Spark ``percentile``
    and DuckDB ``quantile_cont`` (same (n-1)*p definition — the
    rel_quantiles precedent) and the clip compares exactly."""
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return winsorize_df(li, "l_returnflag", "l_quantity")


PIPE_WINSORIZE_SQL = """
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_quantity AS DOUBLE), 0.01) AS lo,
         quantile_cont(CAST(l_quantity AS DOUBLE), 0.99) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_quantity,
       b.lo AS l_quantity_lo, b.hi AS l_quantity_hi,
       least(greatest(CAST(l.l_quantity AS DOUBLE), b.lo), b.hi)
         AS l_quantity_winsorized
FROM lineitem l JOIN bounds b USING (l_returnflag)
"""


def pipe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment over documents
    (:func:`split_train_val_test`, 1% val / 1% test, seed 1). The md5
    bucket arithmetic is engine-portable (first 15 hex chars -> 60-bit
    int), so DuckDB reproduces the exact same membership."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return split_train_val_test(docs, "doc_id")


# 1000000 == SPLIT_PPM (defined below; literal here because this string is
# built at module load, before that assignment runs).
PIPE_SPLIT_SQL = """
SELECT doc_id, lang, source,
       CASE WHEN bucket < 10000 THEN 'test'
            WHEN bucket < 20000 THEN 'val'
            ELSE 'train' END AS split
FROM (
  SELECT doc_id, lang, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|1'), 1, 15)
              AS BIGINT) % 1000000 AS bucket
  FROM documents
)
"""


CAP_PER_SOURCE = 10  # binds at every shipped sf (25+ docs/source)


def pipe_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source admission cap (:func:`cap_per_source_df`, cap 10): the
    sub-bucketed global rank must equal a plain within-source rank over
    the (scramble, doc_id) order — which is exactly what the oracle
    computes, so the offset-recomposition arithmetic certifies."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "lang")
    return cap_per_source_df(docs, CAP_PER_SOURCE)


PIPE_CAP_PER_SOURCE_SQL = f"""
WITH scr AS (
  SELECT doc_id, source, lang,
         (doc_id * {_KNUTH}) % {1_000_003} AS s
  FROM documents
),
ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source ORDER BY s, doc_id) AS rn
  FROM scr
)
SELECT doc_id, source, lang FROM ranked WHERE rn - 1 < {CAP_PER_SOURCE}
"""


TOKEN_BUDGETS = {"en": 6000, "fr": 2000}  # binding at every shipped sf


def pipe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (:func:`sample_token_budget_df`):
    en/fr downsampled to fixed token budgets, other languages pass
    through. The ppm conversion is integer arithmetic the oracle repeats
    exactly (floor division of bigints)."""
    return sample_token_budget_df(_docs(spark, sf_dir), TOKEN_BUDGETS)


def _token_budget_sql() -> str:
    rate_cases = " ".join(
        f"WHEN '{lang}' THEN LEAST({_BUCKETS}, (CAST({budget} AS BIGINT) * {_BUCKETS}) // t.tok)"
        for lang, budget in sorted(TOKEN_BUDGETS.items())
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS n_tokens
  FROM documents
),
tot AS (SELECT lang, SUM(n_tokens) AS tok FROM toks GROUP BY 1),
rated AS (
  SELECT k.doc_id, k.lang, k.n_tokens,
         CAST(CASE k.lang {rate_cases} ELSE {_BUCKETS} END AS INT) AS keep_ppm
  FROM toks k JOIN tot t ON t.lang = k.lang
)
SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens, keep_ppm
FROM rated
WHERE (doc_id * {_KNUTH}) % {_BUCKETS} < keep_ppm
"""


PIPE_TOKEN_BUDGET_SQL = _token_budget_sql()


# BPE token budgets, binding at every shipped sf (with the r13 1,024-merge
# table, en totals 10.3k+ / fr 3.7k+ at the gate SFs, growing with sf —
# keep_ppm < 1e6 everywhere).
BPE_TOKEN_BUDGETS = {"en": 6_000, "fr": 2_500}


def pipe_token_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget admission driven by the REAL tokenizer: per-doc BPE
    counts (``text_analysis.bpe_encode_df``) feed the same ppm arithmetic
    as :func:`pipe_token_budget` — the composition a production mixture
    spec actually means by "N tokens of language L" (budgets are consumed
    in model tokens, not whitespace words). The oracle recomputes the BPE
    length with the generated golden-table encoding inside the same
    budget CTE, certifying tokenize -> budget end to end."""
    from .text_analysis import bpe_encode_df

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", "lang").join(
        bpe_encode_df(docs).select(
            "doc_id", F.col("n_bpe").cast("int").alias("n_tokens")
        ),
        "doc_id",
    )
    return sample_token_budget_counts_df(toks, BPE_TOKEN_BUDGETS)


def _token_budget_bpe_sql() -> str:
    from ..functions.bpe import SEP, bpe_enc_ctes

    rate_cases = " ".join(
        f"WHEN '{lang}' THEN LEAST({_BUCKETS}, (CAST({budget} AS BIGINT) * {_BUCKETS}) // t.tok)"
        for lang, budget in sorted(BPE_TOKEN_BUDGETS.items())
    )
    return f"""
WITH {bpe_enc_ctes(cols="lang")},
toks AS (
  SELECT doc_id, lang,
         CASE WHEN norm = '' THEN 0
              ELSE length(s) - length(replace(s, '{SEP}', '')) END AS n_tokens
  FROM enc
),
tot AS (SELECT lang, SUM(n_tokens) AS tok FROM toks GROUP BY 1),
rated AS (
  SELECT k.doc_id, k.lang, k.n_tokens,
         CAST(CASE k.lang {rate_cases} ELSE {_BUCKETS} END AS INT) AS keep_ppm
  FROM toks k JOIN tot t ON t.lang = k.lang
)
SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens, keep_ppm
FROM rated
WHERE (doc_id * {_KNUTH}) % {_BUCKETS} < keep_ppm
"""


PIPE_TOKEN_BUDGET_BPE_SQL = _token_budget_bpe_sql()


def pipe_select_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-quantile selection
    (:func:`select_top_quality_df`, keep top 50%). Evidence doubles are
    micro-rounded: the median interpolation shares the
    lower + (higher-lower)*frac form across engines, but the micro
    compare removes any residual ulp sensitivity from the hash."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    out = select_top_quality_df(spark, docs, keep_fraction=0.5)
    return out.select(
        "doc_id",
        "lang",
        F.round(F.col("quality") * 1e6).cast("bigint").alias("quality_micro"),
        F.round(F.col("q_threshold") * 1e6).cast("bigint").alias(
            "q_threshold_micro"
        ),
    )


PIPE_SELECT_QUALITY_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(len(w) AS DOUBLE) AS n_words,
         CAST(len(list_filter(w, x -> x IN ('the','a','of','is','and','to','in'))) AS DOUBLE) AS n_stop,
         CAST(length(t) AS DOUBLE) AS n_chars,
         CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g')) AS DOUBLE) AS n_alpha
  FROM d
),
scored AS (
  SELECT doc_id, lang,
         0.25 * least(n_words / 100.0, 1.0)
       + 0.25 * (1.0 - abs(n_stop / n_words - 0.4))
       + 0.25 * (n_alpha / n_chars)
       + 0.25 * least(((n_chars - (n_words - 1)) / n_words) / 8.0, 1.0) AS quality
  FROM m
),
thr AS (
  SELECT lang, quantile_cont(quality, 0.5) AS q_threshold
  FROM scored GROUP BY 1
)
SELECT s.doc_id, s.lang,
       CAST(round(s.quality * 1e6) AS BIGINT) AS quality_micro,
       CAST(round(t.q_threshold * 1e6) AS BIGINT) AS q_threshold_micro
FROM scored s JOIN thr t ON t.lang = s.lang
WHERE s.quality >= t.q_threshold
"""


def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over the chunk table (:func:`pack_sequences_df`,
    epoch 0): the (shard, sub)-recomposed running token sum must equal
    the oracle's plain per-shard cumulative sum over the same
    deterministic order — certifying the offset algebra end-to-end."""
    return pack_sequences_df(chunk_windows_df(_docs(spark, sf_dir)))


PIPE_PACK_SEQUENCES_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
dims AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= {CHUNK} THEN 1
              ELSE CAST((len(w) - {CHUNK} + {STRIDE - 1}) // {STRIDE} AS INT) + 1
         END AS n_chunks
  FROM docs
),
exploded AS (
  SELECT doc_id, w, CAST(UNNEST(range(n_chunks)) AS INT) AS chunk_id FROM dims
),
chunks AS (
  SELECT doc_id, chunk_id,
         CAST(len(w[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK}]) AS INT) AS n_tokens
  FROM exploded
),
keyed AS (
  SELECT doc_id, chunk_id, n_tokens,
         CAST((doc_id * {_XXPRIME}) % {N_SHARDS} AS INT) AS shard,
         (doc_id * {_KNUTH}) % {_ORDER_MOD} AS scr
  FROM chunks
),
cum AS (
  SELECT doc_id, chunk_id, n_tokens, shard,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY scr, doc_id, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM keyed
)
SELECT doc_id, chunk_id, shard,
       CAST(c // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(c % {SEQ_LEN} AS INT) AS seq_offset,
       n_tokens
FROM cum
"""


def mixture_balance_df(docs: DataFrame, weights: dict[str, float], key: str = "lang") -> DataFrame:
    """Rebalance the corpus to a target mixture over ``key``: find the
    largest total size lambda the corpus can supply at the requested
    proportions (lambda = min over weighted groups of count/weight), give
    each group a quota of floor(lambda * weight), and admit that group's
    quota lowest documents in the deterministic (Knuth-scramble, doc_id)
    order — the domain/language reweighting step every training-mixture
    spec (uniform, DoReMi-style weights, hand-tuned) compiles down to.
    Groups absent from ``weights`` are dropped (weight 0).

    Determinism matters more than raw sampling here: admission is a pure
    function of (doc_id, weights), so reruns, retries and incremental
    rebuilds admit the same set — same rationale as
    :func:`cap_per_source_df`, whose scramble order this reuses verbatim.

    Scale: counts are one map-side-combined aggregate to |groups| rows
    (computed crash-safely inside the plan — no driver collect); quotas
    derive from a broadcast of those rows; admission is a within-group
    rank against the broadcast quota. The rank window partitions by
    ``key`` — for the cap operator's giant-source regime the sub-bucketed
    rank recomposition of :func:`cap_per_source_df` applies identically;
    kept as the plain window here since |groups| is small and quotas,
    unlike caps, already bound every group's output.
    """
    w_items = sorted(weights.items())
    wdf_rows = ", ".join(f"('{k}', CAST({v!r} AS DOUBLE))" for k, v in w_items)
    spark = docs.sparkSession
    wdf = spark.sql(
        f"SELECT col1 AS {key}, col2 AS w FROM (VALUES {wdf_rows})"
    )
    counts = docs.groupBy(key).agg(F.count("*").alias("cnt"))
    lam = (
        counts.join(wdf, key)
        .agg(F.min(F.col("cnt") / F.col("w")).alias("lam"))
    )
    quotas = (
        wdf.crossJoin(F.broadcast(lam))
        .select(key, F.floor(F.col("lam") * F.col("w")).alias("quota"))
    )
    from pyspark.sql import Window

    scramble = F.pmod(F.col("doc_id") * _KNUTH, F.lit(_ORDER_MOD))
    w_rank = Window.partitionBy(key).orderBy("_scr", "doc_id")
    return (
        docs.withColumn("_scr", scramble)
        .withColumn("_rn", F.row_number().over(w_rank))
        .join(F.broadcast(quotas), key)
        .where(F.col("_rn") <= F.col("quota"))
        .select(*docs.columns)
    )


# Target mixture for the registry entry: deliberately non-uniform so the
# binding group changes with the data (at sf0.01 'fr' binds: 64/0.2 = 320
# = lambda, quotas en 128 / fr 64 / es 64 / de 32 / zh 32).
MIXTURE_WEIGHTS = {"en": 0.4, "fr": 0.2, "es": 0.2, "de": 0.1, "zh": 0.1}


def pipe_mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing (:func:`mixture_balance_df` with the
    fixed :data:`MIXTURE_WEIGHTS` target): quota arithmetic + scramble-rank
    admission must reproduce the oracle's window formulation exactly."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "lang")
    return mixture_balance_df(docs, MIXTURE_WEIGHTS, key="lang")


_MIX_W_SQL = ", ".join(
    f"('{k}', CAST({v!r} AS DOUBLE))" for k, v in sorted(MIXTURE_WEIGHTS.items())
)
PIPE_MIXTURE_BALANCE_SQL = f"""
WITH w(lang, wt) AS (VALUES {_MIX_W_SQL}),
counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
lam AS (SELECT MIN(cnt / wt) AS lam FROM counts JOIN w USING (lang)),
quotas AS (SELECT lang, CAST(floor(lam.lam * wt) AS BIGINT) AS quota FROM w, lam),
ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * {_KNUTH}) % {_ORDER_MOD}, doc_id
         ) AS rn
  FROM documents
)
SELECT r.doc_id, r.source, r.lang
FROM ranked r JOIN quotas q USING (lang)
WHERE r.rn <= q.quota
"""


def dataset_card_df(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) dataset-card statistics for a training corpus.

    One row per shard: doc count, exact-duplicate doc count (normalized
    text recurring anywhere in the corpus — the same md5 key as exact
    dedup), whitespace-token and char mass, mean tokens/doc in micro-units
    and corpus share in ppm — all exact BIGINT arithmetic (half-up integer
    division), so the card is bit-reproducible.

    Plan: one hash aggregate on the content digest (uniform shuffle), one
    digest-keyed join back, a broadcast of the single-row corpus total,
    and one partial-aggregated groupBy on the shard key. Nothing is
    collected; the card itself is |sources| x |langs| rows.
    """
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        F.md5(norm).alias("h"),
        F.size(F.split(norm, " ")).cast("bigint").alias("tokens"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    copies = base.groupBy("h").agg(F.count("*").alias("copies"))
    total = F.broadcast(base.agg(F.count("*").cast("bigint").alias("total")))
    return (
        base.join(copies, "h")
        .crossJoin(total)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.sum("tokens").alias("tokens_sum"),
            F.sum("n_chars").alias("chars_sum"),
            F.first("total").alias("total"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_dup_docs",
            "tokens_sum",
            "chars_sum",
            F.expr(
                "(2 * 1000000 * tokens_sum + n_docs) div (2 * n_docs)"
            ).alias("avg_tokens_micro"),
            F.expr("(1000000 * n_docs) div total").alias("share_ppm"),
        )
    )


def pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card over the documents table (:func:`dataset_card_df`)."""
    return dataset_card_df(_docs(spark, sf_dir))


PIPE_DATASET_CARD_SQL = """
WITH base AS (
  SELECT doc_id, source, lang,
         md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS h,
         CAST(len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
              AS BIGINT) AS tokens,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
),
copies AS (SELECT h, COUNT(*) AS copies FROM base GROUP BY h),
agg AS (
  SELECT b.source, b.lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN c.copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         CAST(SUM(b.tokens) AS BIGINT) AS tokens_sum,
         CAST(SUM(b.n_chars) AS BIGINT) AS chars_sum
  FROM base b JOIN copies c USING (h)
  GROUP BY b.source, b.lang
)
SELECT source, lang, n_docs, n_dup_docs, tokens_sum, chars_sum,
       CAST((2 * 1000000 * tokens_sum + n_docs) // (2 * n_docs) AS BIGINT)
         AS avg_tokens_micro,
       (1000000 * n_docs) // (SELECT COUNT(*) FROM base) AS share_ppm
FROM agg
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "text_chunk_windows": (text_chunk_windows, TEXT_CHUNK_WINDOWS_SQL),
    "text_sample_stratified": (text_sample_stratified, TEXT_SAMPLE_STRATIFIED_SQL),
    "text_shard_assign": (text_shard_assign, TEXT_SHARD_ASSIGN_SQL),
    "pipe_winsorize": (pipe_winsorize, PIPE_WINSORIZE_SQL),
    "pipe_split": (pipe_split, PIPE_SPLIT_SQL),
    # staged round-7 rotation stock (see registry.STAGED_NEXT_ROTATION)
    "pipe_cap_per_source": (pipe_cap_per_source, PIPE_CAP_PER_SOURCE_SQL),
    "pipe_token_budget": (pipe_token_budget, PIPE_TOKEN_BUDGET_SQL),
    "pipe_select_quality": (pipe_select_quality, PIPE_SELECT_QUALITY_SQL),
    "pipe_pack_sequences": (pipe_pack_sequences, PIPE_PACK_SEQUENCES_SQL),
    # staged round-8 rotation stock (declared r07,
    # registry.STAGED_DECLARED_ROUND)
    "pipe_cdc_chunks": (pipe_cdc_chunks, PIPE_CDC_CHUNKS_SQL),
    # staged round-9 addition (registry.STAGED_DECLARED_ROUND)
    "pipe_mixture_balance": (pipe_mixture_balance, PIPE_MIXTURE_BALANCE_SQL),
    # staged r09-continuation (registry.STAGED_DECLARED_ROUND)
    "pipe_dataset_card": (pipe_dataset_card, PIPE_DATASET_CARD_SQL),
}


def select_top_quality_df(
    spark: SparkSession, docs: DataFrame, keep_fraction: float = 0.5
) -> DataFrame:
    """Keep each language's top ``keep_fraction`` of documents by quality
    score — quantile thresholding, the standard way a quality classifier's
    raw scores become a corpus filter (an absolute cutoff is meaningless
    across languages whose score distributions differ).

    Exact per-language thresholds via ``percentile`` on the quality scores
    — ONE aggregate to |langs| rows (map-side combined), broadcast back.
    Ties at the threshold are kept (>=), so the realized fraction can
    slightly exceed the target on tied scores; the tie-break is documented
    rather than hidden behind a nondeterministic row_number. Returns the
    surviving docs plus their (quality, threshold) evidence columns.

    Scale: scoring is narrow; the percentile aggregate's state is per-lang
    (bounded); the filter join broadcasts |langs| rows. No corpus shuffle
    at all — pinned shuffle-free but for the tiny threshold aggregate.
    """
    from pyspark.storagelevel import StorageLevel

    from .text_analysis import quality_score_df

    # Consumed by the threshold aggregate AND the filter join — without
    # the cache the scoring pipeline (and everything upstream of ``docs``)
    # executes once per consumer (r13 double-execute audit). Bounded:
    # corpus rows x a handful of narrow columns; spills, never recomputes.
    scored = docs.join(
        quality_score_df(docs).select("doc_id", "quality"), "doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    thresholds = (
        scored.groupBy("lang")
        .agg(
            F.expr(f"percentile(quality, {1.0 - keep_fraction})").alias("q_threshold")
        )
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .where(F.col("quality") >= F.col("q_threshold"))
    )


def write_distinct_sketch(
    df: DataFrame, key_col: str, group_col: str, path: str, batch_id: int
) -> None:
    """Append one batch's per-group HLL sketches (Datasketches
    ``hll_sketch_agg``) to a sketch store — the mergeable-state pattern for
    incremental distinct counting: a 100 TB pipeline tracking distinct
    users/domains/doc-hashes per slice cannot re-scan history per report,
    and exact distinct state is unbounded; HLL register state is ~KB per
    group and merges associatively, so each batch writes its own sketches
    once and any later union is sketch-sized work.

    Written ``partitionBy(batch_id)`` with dynamic overwrite — idempotent
    under replay, same as the streaming dedup ingester.
    """
    (
        df.groupBy(F.col(group_col).alias("group_key"))
        .agg(F.hll_sketch_agg(key_col).alias("sketch"))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def read_distinct_estimates(spark: SparkSession, path: str) -> DataFrame:
    """Merge every stored batch sketch per group (``hll_union_agg`` — max
    per HLL register, order-insensitive) and return
    (group_key, n_distinct_estimate). Cost is sketch-proportional: the
    original keys are never re-read."""
    return (
        spark.read.parquet(path)
        .groupBy("group_key")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "n_distinct_estimate"
            )
        )
    )


ZORDER_BITS = 16


def zorder_layout_df(
    df: DataFrame, cols: list[str], n_files: int = 64, bits: int = ZORDER_BITS
) -> DataFrame:
    """Z-order (Morton) clustering for multi-column file pruning: map each
    clustering column to a ``bits``-bit rank of its value range, interleave
    the bits into one Morton key, and range-partition + sort by it. Files
    written from the result have SMALL min/max envelopes in EVERY
    clustering column simultaneously — so scans filtering on any of them
    skip most files — where a plain sort clusters only its leading column
    (the standard Delta/Iceberg OPTIMIZE ZORDER rationale, built from
    primitives here).

    Two jobs: a tiny per-column min/max aggregate (scalars to the driver),
    then one narrow Morton projection + ``repartitionByRange`` (sampled
    range exchange) + within-partition sort. Linear value scaling is used
    for the rank (exact quantile ranks would cost a per-column shuffle;
    linear is the documented trade and right for roughly uniform keys).
    Returns the clustered frame with the ``zval`` column (callers write it
    with ``.write``; drop ``zval`` if undesired).
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()
    k = len(cols)
    ranks = []
    for c in cols:
        lo, hi = float(stats[f"min_{c}"]), float(stats[f"max_{c}"])
        span = (hi - lo) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
        ranks.append(
            F.least(
                F.lit((1 << bits) - 1),
                F.floor(scaled * F.lit(float(1 << bits))).cast("bigint"),
            )
        )
    zval = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            zval = zval + F.shiftleft(bit.cast("bigint"), i * k + j)
    return (
        df.withColumn("zval", zval)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
    )


def write_quantile_sketch(
    df: DataFrame, value_col: str, group_col: str, path: str, batch_id: int, k: int = 200
) -> None:
    """Append one batch's per-group KLL quantile sketches (Datasketches
    ``kll_sketch_agg_double``) to a sketch store — the quantile sibling of
    :func:`write_distinct_sketch`: a pipeline tracking latency / length /
    score distributions per slice at 100 TB cannot keep raw values, and
    KLL state is O(k log n) per group with ~1.65% worst-case rank error at
    the default k=200, mergeable without re-reading history.

    Written ``partitionBy(batch_id)`` with dynamic overwrite — replaying a
    batch replaces exactly its own partition (idempotent retry), matching
    the HLL store and the streaming dedup ingester.
    """
    (
        df.groupBy(F.col(group_col).alias("group_key"))
        .agg(
            F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(k)
            ).alias("sketch")
        )
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def read_quantile_estimates(
    spark: SparkSession, path: str, quantiles: list[float]
) -> DataFrame:
    """Merge every stored batch sketch per group (``kll_merge_agg_double``,
    order-insensitive) and return one row per group with a ``q_<pct>``
    column per requested quantile plus the exact merged row count ``n``
    (KLL tracks n exactly even though values are compacted). Cost is
    sketch-proportional: the raw values are never re-read.
    """
    merged = (
        spark.read.parquet(path)
        .groupBy("group_key")
        .agg(F.kll_merge_agg_double("sketch").alias("sk"))
    )
    cols = [
        F.kll_sketch_get_quantile_double("sk", F.lit(float(q))).alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return merged.select(
        "group_key", *cols, F.kll_sketch_get_n_double("sk").alias("n")
    )


def pipe_hll_store_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for the HLL sketch store (r09 verdict #4): the
    two-batch store roundtrip against an inline merge of the same batches.

    Splits ``events`` into two batches (event_id parity), writes each
    batch's per-event_type HLL sketches into a store via
    :func:`write_distinct_sketch`, merges them back with
    :func:`read_distinct_estimates`, and emits per group:

    - ``n_exact`` — the exact distinct user count (value-matched against
      the oracle's COUNT(DISTINCT)),
    - ``store_equals_inline_merge`` — merged-store estimate == the same
      two batch sketches unioned INLINE (no parquet roundtrip). Identical
      inputs through the identical union gadget: any false means the
      store write/read lost or corrupted sketch state, and the driver
      hash-mismatches. (A merged-vs-ONE-SHOT equality would NOT hold at
      every scale: Datasketches keeps a single sketch in exact sparse
      mode until ~k entries, while the union of two sketches densifies
      to HLL_8 earlier — measured at sf0.1: one-shot 1480-1499 exact vs
      merged 1488 dense estimate. The r10 sf0.1 margin run caught
      exactly this; the store-vs-inline form is representation-exact at
      ANY scale.)
    - ``within_10pct`` — the merged estimate's envelope vs exact (lgK=12
      default ~1.6% rel. error; 10% is the same generous pin the
      rel_approx_distinct tests use).

    The oracle emits TRUE for both flags, so the flags are real
    assertions, not decoration. Store lives in a per-call temp dir,
    removed after materialization (the stream_hourly_file_sink pattern).
    """
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="dgds_hll_store_")
    path = f"{base}/hll"
    write_distinct_sketch(ev.where(F.col("event_id") % 2 == 0), "user_id", "event_type", path, 0)
    write_distinct_sketch(ev.where(F.col("event_id") % 2 == 1), "user_id", "event_type", path, 1)
    merged = read_distinct_estimates(spark, path)
    inline = (
        ev.groupBy(
            F.col("event_type").alias("group_key"),
            (F.col("event_id") % 2).alias("b"),
        )
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("group_key")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("inline_est"))
    )
    exact = ev.groupBy(F.col("event_type").alias("group_key")).agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    out = (
        merged.join(inline, "group_key")
        .join(exact, "group_key")
        .select(
            "group_key",
            "n_exact",
            (F.col("n_distinct_estimate") == F.col("inline_est")).alias(
                "store_equals_inline_merge"
            ),
            (
                F.abs(F.col("n_distinct_estimate") - F.col("n_exact"))
                <= F.lit(0.1) * F.col("n_exact")
            ).alias("within_10pct"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


PIPE_HLL_STORE_MERGE_SQL = """
SELECT event_type AS group_key,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS store_equals_inline_merge,
       TRUE AS within_10pct
FROM events GROUP BY event_type
"""


def write_theta_sketch(
    df: DataFrame, key_col: str, group_col: str, path: str, batch_id: int
) -> None:
    """Append one batch's per-group Theta sketches to a sketch store.

    Theta is the SET-ALGEBRA sketch: unlike HLL (union-only), stored theta
    state supports intersection and difference estimates — "distinct users
    seen in slice A AND slice B" across a 100 TB history without ever
    joining raw keys. Same store contract as the HLL/KLL siblings:
    ``partitionBy(batch_id)``, dynamic overwrite, idempotent replay.
    """
    (
        df.groupBy(F.col(group_col).alias("group_key"))
        .agg(F.theta_sketch_agg(key_col).alias("sketch"))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def read_theta_set_estimates(spark: SparkSession, path: str) -> DataFrame:
    """Merge batches per group, then estimate the distinct count of every
    group PAIR's union, intersection, and difference — the set-overlap
    report (audience overlap, slice contamination, A/B reach) that raw-key
    joins would need a full-history shuffle for. The pair "join" is over
    one merged sketch row per group (driver-scale), never over keys.

    Returns (group_a, group_b, n_a, n_b, n_union, n_intersection, n_diff)
    for group_a < group_b.
    """
    merged = (
        spark.read.parquet(path)
        .groupBy("group_key")
        .agg(F.theta_union_agg("sketch").alias("sk"))
    )
    a, b = merged.alias("a"), merged.alias("b")
    return (
        a.join(b, F.col("a.group_key") < F.col("b.group_key"))
        .select(
            F.col("a.group_key").alias("group_a"),
            F.col("b.group_key").alias("group_b"),
            F.theta_sketch_estimate(F.col("a.sk")).alias("n_a"),
            F.theta_sketch_estimate(F.col("b.sk")).alias("n_b"),
            F.theta_sketch_estimate(
                F.theta_union(F.col("a.sk"), F.col("b.sk"))
            ).alias("n_union"),
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
            ).alias("n_intersection"),
            F.theta_sketch_estimate(
                F.theta_difference(F.col("a.sk"), F.col("b.sk"))
            ).alias("n_diff"),
        )
    )


def pipe_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`zorder_layout_df` (the last library-only
    layout operator, r09 verdict "missing" #2 tail): Morton-cluster
    ``lineitem`` on (l_partkey, l_suppkey) and certify the interleaved
    key itself — (l_orderkey, l_linenumber, zval) value-matched against an
    oracle that replays the min/max scaling and the 32-term bit
    interleave. The scaling divides/multiplies the same doubles in the
    same order on both engines (IEEE-deterministic), and everything after
    the floor is exact integer bit algebra, so the match is exact — the
    range-exchange + in-partition sort the writer adds on top changes
    file layout, not values, and its plan shape is pinned in tests.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    out = zorder_layout_df(li, ["l_partkey", "l_suppkey"])
    return out.select("l_orderkey", "l_linenumber", "zval")


def _zorder_oracle_sql(bits: int = ZORDER_BITS) -> str:
    cols = ("l_partkey", "l_suppkey")
    terms = []
    for i in range(bits):
        for j in range(len(cols)):
            terms.append(f"(((r{j} >> {i}) & 1) << {i * len(cols) + j})")
    zexpr = " + ".join(terms)
    cap = (1 << bits) - 1
    scale = float(1 << bits)
    rank_exprs = ",\n         ".join(
        f"LEAST({cap}, CAST(FLOOR((CAST({c} AS DOUBLE) - lo{j}) / "
        f"(CASE WHEN hi{j} - lo{j} = 0 THEN 1.0 ELSE hi{j} - lo{j} END) "
        f"* {scale!r}) AS BIGINT)) AS r{j}"
        for j, c in enumerate(cols)
    )
    stat_exprs = ", ".join(
        f"CAST(MIN({c}) AS DOUBLE) AS lo{j}, CAST(MAX({c}) AS DOUBLE) AS hi{j}"
        for j, c in enumerate(cols)
    )
    return f"""
WITH stats AS (SELECT {stat_exprs} FROM lineitem),
ranked AS (
  SELECT l_orderkey, l_linenumber,
         {rank_exprs}
  FROM lineitem, stats
)
SELECT l_orderkey, l_linenumber, CAST({zexpr} AS BIGINT) AS zval FROM ranked
"""


PIPE_ZORDER_LAYOUT_SQL = _zorder_oracle_sql()


def pipe_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for the Theta sketch store's SET ALGEBRA — the
    capability HLL cannot give (intersection/difference across stored
    slices without re-joining raw keys).

    Two batches (event_id parity) of per-event_type theta sketches over
    ``user_id`` go through :func:`write_theta_sketch`;
    :func:`read_theta_set_estimates` merges the store and reports every
    group pair's |A|, |B|, |A∪B|, |A∩B|, |A\\\\B|. The shipped testdata
    keeps every group (and every pairwise union) under the sketch's
    nominal 4096 entries, so the sketches never leave EXACT mode and the
    rounded counts value-match the oracle's true set sizes — certifying
    store write + batch merge + union/intersection/difference in one row.
    A future corpus crossing 4096 distinct keys per pair would flip the
    sketch into estimation mode and fail this hash loudly (the pin is on
    exactness at gate scale, not on HLL-style envelopes).
    """
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="dgds_theta_store_")
    path = f"{base}/theta"
    write_theta_sketch(ev.where(F.col("event_id") % 2 == 0), "user_id", "event_type", path, 0)
    write_theta_sketch(ev.where(F.col("event_id") % 2 == 1), "user_id", "event_type", path, 1)
    est = read_theta_set_estimates(spark, path)
    out = est.select(
        "group_a",
        "group_b",
        *[
            F.round(F.col(c)).cast("bigint").alias(c)
            for c in ("n_a", "n_b", "n_union", "n_intersection", "n_diff")
        ],
    ).localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return out


PIPE_THETA_OVERLAP_SQL = """
WITH per AS (SELECT DISTINCT event_type AS g, user_id AS u FROM events),
sizes AS (SELECT g, COUNT(*) AS n FROM per GROUP BY g),
inter AS (
  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS ni
  FROM per a JOIN per b ON a.u = b.u AND a.g < b.g
  GROUP BY 1, 2
)
SELECT s1.g AS group_a, s2.g AS group_b,
       s1.n AS n_a, s2.n AS n_b,
       s1.n + s2.n - COALESCE(i.ni, 0) AS n_union,
       COALESCE(i.ni, 0) AS n_intersection,
       s1.n - COALESCE(i.ni, 0) AS n_diff
FROM sizes s1
JOIN sizes s2 ON s1.g < s2.g
LEFT JOIN inter i ON i.ga = s1.g AND i.gb = s2.g
"""


def winsorize_df(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to that group's exact
    [lo, hi] percentiles — the outlier containment step before loss-scale-
    sensitive statistics (quality scores, length normalization). Same
    shape as the quantile quality gate: one map-side-combined ``percentile``
    aggregate to ONE ROW PER GROUP, broadcast back, then a narrow clip —
    the raw values never shuffle. Adds ``<value>_winsorized`` plus the
    bound columns.
    """
    bounds = df.groupBy(F.col(group_col)).agg(
        F.percentile(F.col(value_col).cast("double"), F.lit(lo)).alias("_lo"),
        F.percentile(F.col(value_col).cast("double"), F.lit(hi)).alias("_hi"),
    )
    out_col = f"{value_col}_winsorized"
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col).cast("double"), F.col("_lo")), F.col("_hi")),
        )
        .withColumnRenamed("_lo", f"{value_col}_lo")
        .withColumnRenamed("_hi", f"{value_col}_hi")
    )


SPLIT_PPM = 1_000_000


def split_train_val_test(
    df: DataFrame,
    id_col: str,
    val_ppm: int = 10_000,
    test_ppm: int = 10_000,
    seed: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every training
    pipeline needs, as a pure narrow map: split = Knuth-scrambled md5 hash
    of (id, seed) bucketed in ppm space, so (a) membership is a pure
    function of the id (resumable, re-runnable, join-free — any table
    keyed by the same id splits identically), (b) fractions are exact in
    expectation with no rand() and no global shuffle, (c) changing the
    seed redraws the split wholesale. Returns the input plus a ``split``
    column in {'train', 'val', 'test'}.

    Contrast ``randomSplit``: rand() is neither stable across retries nor
    consistent across tables sharing a key — both disqualifying for a
    corpus that must be reproducible at 100 TB.
    """
    if val_ppm < 0 or test_ppm < 0 or val_ppm + test_ppm > SPLIT_PPM:
        raise ValueError(f"invalid split ppms: val={val_ppm} test={test_ppm}")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(SPLIT_PPM))
    split = (
        F.when(bucket < test_ppm, F.lit("test"))
        .when(bucket < test_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def temperature_mix_df(
    df: DataFrame,
    group_col: str,
    id_col: str,
    keep_ppm: int = 500_000,
    seed: int = 7,
) -> DataFrame:
    """Temperature-balanced group resampling at alpha = 0.5 — the standard
    multilingual rebalancing (sample languages proportionally to p^alpha so
    head languages shrink and tail languages keep more of their data;
    alpha=0.5 is the sqrt temperature mT5/XLM-R popularized), with EXACT
    integer-rational plumbing so a DuckDB oracle replays membership:

    - per-group budget share ∝ ``s_g = floor(sqrt(n_g))`` — IEEE sqrt is
      correctly ROUNDED (unlike pow), so floor(sqrt(bigint)) is the same
      integer on every engine; a float p^0.7 would differ by ulps and flip
      threshold floors;
    - per-group admission threshold (ppm) ``t_g = min(1e6,
      (keep_ppm * N * s_g) div (S * n_g))`` — all BIGINT products and one
      floor-div (operands positive: Spark's truncating div == DuckDB's
      flooring //);
    - admission: the same portable md5 ppm bucket as
      :func:`split_train_val_test`, keyed (id, seed) — deterministic,
      resumable, join-free on the data side.

    One tiny group-count aggregate broadcast back as thresholds; the
    corpus itself takes a narrow filter, never a shuffle. Returns the kept
    rows plus their group's ``threshold_ppm``.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(group_col)).agg(F.count("*").alias("n_g"))
    stats = counts.withColumn(
        "s_g", F.floor(F.sqrt(F.col("n_g").cast("double"))).cast("bigint")
    )
    w_all = Window.partitionBy(F.lit(1))
    stats = stats.select(
        group_col,
        "n_g",
        "s_g",
        F.sum("n_g").over(w_all).alias("n_total"),
        F.sum("s_g").over(w_all).alias("s_total"),
    )
    thresholds = stats.select(
        group_col,
        F.least(
            F.lit(1_000_000).cast("bigint"),
            F.expr(f"({keep_ppm} * n_total * s_g) div (s_total * n_g)"),
        ).alias("threshold_ppm"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(1_000_000))
    return (
        df.join(F.broadcast(thresholds), group_col)
        .where(bucket < F.col("threshold_ppm"))
    )


def pipe_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: alpha=0.5 temperature mix over documents by lang,
    keeping ~half the corpus rebalanced toward tail languages."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_mix_df(docs, "lang", "doc_id")


PIPE_TEMPERATURE_MIX_SQL = """
WITH counts AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
stats AS (
  SELECT lang, n_g,
         CAST(floor(sqrt(CAST(n_g AS DOUBLE))) AS BIGINT) AS s_g
  FROM counts
),
tot AS (SELECT SUM(n_g) AS n_total, SUM(s_g) AS s_total FROM stats),
thr AS (
  SELECT lang,
         CAST(LEAST(1000000, (500000 * n_total * s_g) // (s_total * n_g))
              AS BIGINT) AS threshold_ppm
  FROM stats, tot
)
SELECT d.doc_id, d.lang, t.threshold_ppm
FROM documents d JOIN thr t USING (lang)
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|7'), 1, 15)
           AS BIGINT) % 1000000 < t.threshold_ppm
"""


PIPELINE_QUERIES.update(
    {
        # staged r10: HLL sketch-store merge differential (r09 verdict #4)
        "pipe_hll_store_merge": (pipe_hll_store_merge, PIPE_HLL_STORE_MERGE_SQL),
        # staged r10: Theta store set algebra, exact-mode value match
        "pipe_theta_overlap": (pipe_theta_overlap, PIPE_THETA_OVERLAP_SQL),
        # staged r10: Morton clustering key, bit-interleave replay oracle
        "pipe_zorder_layout": (pipe_zorder_layout, PIPE_ZORDER_LAYOUT_SQL),
        # staged r10: sqrt-temperature multilingual rebalancing
        "pipe_temperature_mix": (pipe_temperature_mix, PIPE_TEMPERATURE_MIX_SQL),
    }
)


# ---------------------------------------------------------------------------
# Count-min sketch as a TABLE (frequency sibling of the HLL/KLL/Theta stores
# above): depth x width integer counters, each depth row an independent hash
# of the key, point estimate = MIN over rows of the addressed counter. The
# reference's query surface has no frequency sketch; this is north-star §2c
# infrastructure — a 100 TB vocabulary/heavy-hitter pass cannot groupBy every
# raw key per batch window, but a CMS is O(depth*width) mergeable state with
# the one-sided guarantee est >= true (collisions only ever ADD), and
# est <= true + (e/width)*N w.p. >= 1 - e^-depth.
#
# Spark shape: building the sketch is explode(depth) -> groupBy(j, bucket),
# and the partial (map-side) aggregation collapses each task's contribution
# to <= depth*width rows BEFORE the exchange — shuffle volume is
# O(tasks * depth * width), constant in data size. Point queries broadcast
# the KB-scale sketch, never the corpus. The counters are exact BIGINTs and
# xxhash64 is deterministic, so the whole structure is reproducible across
# retries — same property the stratified sampler above leans on.
# ---------------------------------------------------------------------------

CMS_DEPTH = 5
# Deliberately undersized vs the gate corpus's 155 (lang, token) keys so
# collisions are REAL at every sf (production would size width ~2^20): the
# entry's flags certify the estimator's one-sided error under collision
# pressure, not a vacuous est == exact.
CMS_WIDTH = 64


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """One batch's count-min sketch over ``key_col`` as a (j, bucket, cnt)
    table: row j addresses ``xxhash64(key, j) mod width``. The explode
    multiplies rows by ``depth`` inside the map stage only — hash partial
    aggregation reduces each task to <= depth*width counter rows before
    any shuffle."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    return (
        df.select(F.col(key_col).alias("k"))
        .select("k", j)
        .groupBy("j", F.pmod(F.xxhash64("k", F.col("j")), F.lit(width)).alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def write_cms_sketch(
    df: DataFrame,
    key_col: str,
    path: str,
    batch_id: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> None:
    """Append one batch's CMS to the sketch store, ``partitionBy(batch_id)``
    with dynamic overwrite — replaying a batch replaces exactly its own
    partition (the HLL/KLL store contract; idempotent retry)."""
    (
        cms_sketch(df, key_col, depth, width)
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def read_cms_store(spark: SparkSession, path: str) -> DataFrame:
    """Merge every stored batch sketch: counter-wise SUM over (j, bucket).
    CMS merge is exact (counters are linear), so the merged store equals
    the one-shot sketch of the concatenated batches bit for bit."""
    return (
        spark.read.parquet(path)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` (one row per distinct key):
    est = MIN over depth rows of the addressed counter. The sketch side is
    depth*width rows — broadcast it; the keys side stays distributed, so
    the query costs one narrow map join however large the key set."""
    addressed = keys.select(F.col(key_col).alias("k")).distinct().select(
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).select("k", "j", F.pmod(F.xxhash64("k", F.col("j")), F.lit(width)).alias("bucket"))
    return (
        addressed.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_est"))
        .select(F.col("k").alias(key_col), "cms_est")
    )


def pipe_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: CMS heavy hitters over (lang, token) keys of the
    documents corpus — the vocabulary-frequency pass of a training
    pipeline, run through the STORE (two doc_id-parity batches written
    partitioned, merged at read, so a merge bug is on the tested path).

    Selection is CMS-first, exactness-verified: CMS guarantees no false
    negatives (est >= true), so filtering candidates at est >= phi*N and
    then keeping those whose EXACT count clears the same threshold yields
    exactly the true heavy-hitter set — the standard CMS+exact-verify
    topology (sketch prunes, one exact pass over survivors confirms).
    phi = 5/1000 (integer arithmetic: n*1000 >= 5*N, bit-stable) selects
    105/67/64 of the 155 keys at sf0.001/0.01/0.1.

    Emitted flags are real assertions the oracle pins TRUE:
    - ``cms_ge_exact`` — the one-sided estimator guarantee (collisions
      only ever add); FALSE means per-key counter mass was lost.
    - ``cms_within_eps`` — est - exact <= ceil(3*N/width), the e/width
      error bound rounded up to the next integer grade (measured actual
      worst slack ~0.0185*N at every sf, a 2.5x margin).
    - ``mass_conserved`` — the EXACT linearity invariant: every depth
      row's counters sum to N precisely. A replayed batch that APPENDS
      instead of overwriting doubles the mass, a dropped partition loses
      it — either flips this flag on every row (fault-injected in
      tests/test_cms.py); the per-key envelope alone cannot promise that
      (rare keys sit far below the collision-noise floor).
    """
    import shutil
    import tempfile

    docs = _docs(spark, sf_dir)
    # The key is a STRUCT, not a separator-joined string: xxhash64 hashes
    # struct fields directly, so a token containing any would-be separator
    # char can never be truncated or aliased on decode (r11 ADVICE — the
    # old concat_ws('|')/split_part round trip diverged from the oracle
    # for tokens containing '|').
    toks = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", F.struct("lang", "tok").alias("key"))
    )
    base = tempfile.mkdtemp(prefix="dgds_cms_store_")
    write_cms_sketch(toks.where(F.col("doc_id") % 2 == 0), "key", base, 0)
    write_cms_sketch(toks.where(F.col("doc_id") % 2 == 1), "key", base, 1)
    sketch = read_cms_store(spark, base)
    exact = toks.groupBy("key").agg(F.count("*").cast("bigint").alias("n"))
    total = toks.agg(F.count("*").cast("bigint").alias("n_total"))
    est = cms_point_estimates(sketch, exact.select("key"), "key")
    mass_ok = (
        sketch.groupBy("j")
        .agg(F.sum("cnt").cast("bigint").alias("mass"))
        .crossJoin(F.broadcast(total))
        .agg(F.every(F.col("mass") == F.col("n_total")).alias("mass_conserved"))
    )
    out = (
        exact.join(est, "key")
        .crossJoin(F.broadcast(total))
        .where(F.col("cms_est") * 1000 >= 5 * F.col("n_total"))  # CMS prune
        .where(F.col("n") * 1000 >= 5 * F.col("n_total"))  # exact verify
        .crossJoin(F.broadcast(mass_ok))
        .select(
            F.col("key.lang").alias("lang"),
            F.col("key.tok").alias("tok"),
            "n",
            (F.col("cms_est") >= F.col("n")).alias("cms_ge_exact"),
            (
                F.col("cms_est") - F.col("n")
                <= F.ceil(F.lit(3) * F.col("n_total") / F.lit(CMS_WIDTH))
            ).alias("cms_within_eps"),
            "mass_conserved",
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


PIPE_CMS_HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT lang, lower(t) AS tok
  FROM documents, UNNEST(regexp_split_to_array(text, '\\s+')) AS u(t)
  WHERE t <> ''
),
c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS n_total FROM toks)
SELECT lang, tok, n, TRUE AS cms_ge_exact, TRUE AS cms_within_eps,
       TRUE AS mass_conserved
FROM c, tot WHERE n * 1000 >= 5 * n_total
"""


PIPELINE_QUERIES.update(
    {
        # staged r11: CMS frequency store + exact-verified heavy hitters
        "pipe_cms_heavy_hitters": (
            pipe_cms_heavy_hitters,
            PIPE_CMS_HEAVY_HITTERS_SQL,
        ),
    }
)


def pipe_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in ONE DAG — the run a user of
    this engine actually executes, stage outputs feeding stage inputs
    rather than each stage reading the raw corpus:

        near-dup clusters -> survivors        (dedup.dedup_clusters_df)
        -> per-lang quality-quantile filter   (select_top_quality_df)
        -> per-lang token-budget admission    (sample_token_budget_df)

    Composition changes the semantics vs the standalone entries, and the
    oracle certifies exactly that: quality thresholds are quantiles OF THE
    DEDUPED corpus, and budget keep-rates are computed from the
    QUALITY-KEPT token totals — so a stage wired to the wrong input (the
    classic pipeline bug this entry exists to catch) shifts thresholds and
    hash-mismatches even when each stage is individually correct.

    Scale shape is the sum of its parts, all certified individually:
    banded LSH pairs + tiny CC loop over paired docs only, one |langs|-row
    threshold aggregate per stage, Knuth-hash admission. Emits the final
    admitted docs with per-stage evidence columns."""
    from .dedup import dedup_clusters_df

    docs = _docs(spark, sf_dir)
    losers = (
        dedup_clusters_df(spark, docs)
        .where(~F.col("is_survivor"))
        .select("doc_id")
    )
    surv = docs.join(losers, "doc_id", "left_anti")
    # Three consumers (budget totals collect, admission filter, evidence
    # join) — materialize so the dedup-anti-join + quality-quantile subtree
    # runs once, not per consumer (r13 double-execute audit). Eager
    # localCheckpoint rather than persist (r16): the barrier also truncates
    # the logical plan, so the consumers stop re-analyzing the stacked
    # dedup+quantile tree per use (interleaved A/B at sf0.1/c32: persist
    # 15.4 s cold / 5.9 s warm vs checkpoint 7.3 / 5.3, identical rows).
    kept = select_top_quality_df(
        spark, surv.select("doc_id", "lang", "text"), keep_fraction=0.5
    ).select(
        "doc_id",
        "lang",
        "text",
        F.round(F.col("quality") * 1e6).cast("bigint").alias("quality_micro"),
    ).localCheckpoint(eager=True)
    admitted = sample_token_budget_df(kept, TOKEN_BUDGETS)
    return admitted.join(kept.select("doc_id", "quality_micro"), "doc_id").select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "keep_ppm",
        "quality_micro",
    )


def _end_to_end_sql() -> str:
    rate_cases = " ".join(
        f"WHEN '{lang}' THEN LEAST({_BUCKETS}, (CAST({budget} AS BIGINT) * {_BUCKETS}) // t.tok)"
        for lang, budget in sorted(TOKEN_BUDGETS.items())
    )
    return f"""
WITH RECURSIVE docs0 AS (
  SELECT doc_id, lang,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM docs0
  WHERE len(w) >= 3
),
pre AS MATERIALIZED (
  SELECT doc_id, len(s) AS n_sh,
         unnest(list_sort(s)[1 : len(s) - CAST(ceil(len(s) * 0.5) AS BIGINT) + 1]) AS h
  FROM sh
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pre a JOIN pre b
    ON a.h = b.h AND a.doc_id < b.doc_id
   AND b.n_sh >= a.n_sh * 0.5 AND a.n_sh >= b.n_sh * 0.5
),
pairs AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
  WHERE CAST(len(a.s) + len(b.s) - len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(doc_id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.doc_id
),
losers AS (
  SELECT doc_id FROM walk GROUP BY doc_id HAVING doc_id <> MIN(lbl)
),
surv AS MATERIALIZED (
  SELECT d.doc_id, d.lang, d.t, d.w FROM docs0 d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
),
m AS (
  SELECT doc_id, lang,
         CAST(len(w) AS DOUBLE) AS n_words,
         CAST(len(list_filter(w, x -> x IN ('the','a','of','is','and','to','in'))) AS DOUBLE) AS n_stop,
         CAST(length(t) AS DOUBLE) AS n_chars,
         CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g')) AS DOUBLE) AS n_alpha
  FROM surv
),
scored AS (
  SELECT doc_id, lang,
         0.25 * least(n_words / 100.0, 1.0)
       + 0.25 * (1.0 - abs(n_stop / n_words - 0.4))
       + 0.25 * (n_alpha / n_chars)
       + 0.25 * least(((n_chars - (n_words - 1)) / n_words) / 8.0, 1.0) AS quality
  FROM m
),
thr AS (
  SELECT lang, quantile_cont(quality, 0.5) AS q_threshold
  FROM scored GROUP BY 1
),
kept AS MATERIALIZED (
  SELECT s.doc_id, s.lang,
         CAST(round(s.quality * 1e6) AS BIGINT) AS quality_micro
  FROM scored s JOIN thr ON thr.lang = s.lang
  WHERE s.quality >= thr.q_threshold
),
toks AS (
  SELECT k.doc_id, k.lang, k.quality_micro, len(v.w) AS n_tokens
  FROM kept k JOIN surv v ON v.doc_id = k.doc_id
),
tot AS (SELECT lang, SUM(n_tokens) AS tok FROM toks GROUP BY 1),
rated AS (
  SELECT k.doc_id, k.lang, k.n_tokens, k.quality_micro,
         CAST(CASE k.lang {rate_cases} ELSE {_BUCKETS} END AS INT) AS keep_ppm
  FROM toks k JOIN tot t ON t.lang = k.lang
)
SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens, keep_ppm, quality_micro
FROM rated
WHERE (doc_id * {_KNUTH}) % {_BUCKETS} < keep_ppm
"""


PIPE_END_TO_END_SQL = _end_to_end_sql()


PIPELINE_QUERIES.update(
    {
        # staged r11: the composed dedup->quality->budget pipeline (stage
        # outputs feed stage inputs; thresholds move with the composition)
        "pipe_end_to_end": (pipe_end_to_end, PIPE_END_TO_END_SQL),
    }
)


# ---------------------------------------------------------------------------
# Training-order operators: the two corpus-ordering passes between data
# selection and the dataloader — a reproducible per-epoch shuffle and
# difficulty (curriculum) bucketing. Both deterministic by construction
# (hash keys / integer thresholds, no rand()): a 100 TB training run that
# crashes at step N must resume with the SAME order, and an eval re-run
# must see the batch the loss spike came from.
# ---------------------------------------------------------------------------

SHUFFLE_EPOCHS = 2
SHUFFLE_SHARDS = 64


def epoch_shuffle_df(
    docs: DataFrame, epochs: int = SHUFFLE_EPOCHS, shards: int = SHUFFLE_SHARDS
) -> DataFrame:
    """Deterministic per-epoch corpus shuffle: epoch e orders docs by the
    engine-portable md5 integer of ``doc_id|e`` — a different pseudorandom
    permutation per epoch, bit-reproducible across engines and retries.
    The order is materialized two-level, (epoch, shard, pos): shard =
    k mod shards (the hash's low bits), pos = rank by (k, doc_id) within
    the shard — so the ranking window is
    per-(epoch, shard), never a global single-partition sort (the naive
    global row_number would serialize 100 TB through one task; the
    dataloader consumes shards in shard order, positions within). Returns
    (epoch, shard, pos, doc_id)."""
    e = F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch")
    keyed = docs.select("doc_id").select("doc_id", e).select(
        "doc_id",
        "epoch",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("doc_id"), F.col("epoch"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("k"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("epoch", F.pmod("k", F.lit(shards))).orderBy(
        "k", "doc_id"
    )
    return keyed.select(
        "epoch",
        F.pmod("k", F.lit(shards)).cast("int").alias("shard"),
        (F.row_number().over(w) - 1).cast("int").alias("pos"),
        "doc_id",
    )


def pipe_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the 2-epoch 64-shard deterministic shuffle of the
    documents corpus. The oracle replays the md5 keys and the per-shard
    ranks exactly, so a nondeterministic order (rand(), unstable
    tie-break) or a single-partition global sort rewrite both
    hash-mismatch."""
    return epoch_shuffle_df(_docs(spark, sf_dir))


PIPE_EPOCH_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT d.doc_id, e.epoch,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' ||
                                 CAST(e.epoch AS VARCHAR)), 1, 15) AS BIGINT) AS k
  FROM documents d
  CROSS JOIN (SELECT CAST(UNNEST(range({SHUFFLE_EPOCHS})) AS INT) AS epoch) e
)
SELECT epoch, CAST(k % {SHUFFLE_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, k % {SHUFFLE_SHARDS}
                               ORDER BY k, doc_id) - 1 AS INT) AS pos,
       doc_id
FROM keyed
"""


CURRICULUM_BUCKETS = 8


def pipe_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum (difficulty) bucketing: equi-width integer buckets over
    the quality score — the ordering pass that feeds easy-to-hard training
    schedules. Exact integer arithmetic end to end: quality in micro-units,
    bucket = (q - lo) * n // (hi - lo + 1) against the corpus min/max (a
    two-scalar aggregate, broadcast back) — no global sort, no ntile (a
    rank-based split would need a corpus-wide window; equi-width is the
    documented trade and the right one for bounded scores). Emits per-doc
    (doc_id, lang, quality_micro, bucket)."""
    from .text_analysis import quality_score_df

    docs = _docs(spark, sf_dir)
    scored = docs.select("doc_id", "lang").join(
        quality_score_df(docs).select(
            "doc_id", F.round(F.col("quality") * 1e6).cast("bigint").alias("q")
        ),
        "doc_id",
    )
    bounds = scored.agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    )
    # Integer DIV, not double `/` + cast: keeps the "integer arithmetic
    # end to end" contract literal (a double quotient can truncate a ulp
    # low at large magnitudes — the hazard pipe_weighted_sample documents)
    # and matches the oracle's `//` exactly (numerator >= 0, so floor ==
    # trunc) (r11 ADVICE).
    return (
        scored.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "lang",
            F.col("q").alias("quality_micro"),
            F.expr(
                f"CAST((q - lo) * {CURRICULUM_BUCKETS} DIV (hi - lo + 1) AS INT)"
            ).alias("bucket"),
        )
    )


PIPE_CURRICULUM_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(len(w) AS DOUBLE) AS n_words,
         CAST(len(list_filter(w, x -> x IN ('the','a','of','is','and','to','in'))) AS DOUBLE) AS n_stop,
         CAST(length(t) AS DOUBLE) AS n_chars,
         CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g')) AS DOUBLE) AS n_alpha
  FROM d
),
scored AS (
  SELECT doc_id, lang,
         CAST(round((0.25 * least(n_words / 100.0, 1.0)
       + 0.25 * (1.0 - abs(n_stop / n_words - 0.4))
       + 0.25 * (n_alpha / n_chars)
       + 0.25 * least(((n_chars - (n_words - 1)) / n_words) / 8.0, 1.0)) * 1e6)
              AS BIGINT) AS q
  FROM m
),
bounds AS (SELECT MIN(q) AS lo, MAX(q) AS hi FROM scored)
SELECT doc_id, lang, q AS quality_micro,
       CAST((q - lo) * {CURRICULUM_BUCKETS} // (hi - lo + 1) AS INT) AS bucket
FROM scored, bounds
"""


PIPELINE_QUERIES.update(
    {
        # staged r11: deterministic resumable per-epoch shuffle
        "pipe_epoch_shuffle": (pipe_epoch_shuffle, PIPE_EPOCH_SHUFFLE_SQL),
        # staged r11: curriculum difficulty bucketing, integer-exact
        "pipe_curriculum_buckets": (
            pipe_curriculum_buckets,
            PIPE_CURRICULUM_SQL,
        ),
    }
)


WEIGHTED_SAMPLE_K = 100


def pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted bottom-k sampling: keep the K docs with the
    smallest ``md5int(doc_id) // n_tokens`` priority — a longer doc gets a
    proportionally smaller priority, so inclusion probability scales with
    token weight (the bottom-k / priority-sampling family, mergeable by
    construction: the bottom-k of a union is computable from per-partition
    bottom-ks, which is exactly how Spark executes ORDER BY + LIMIT as
    TakeOrderedAndProject — per-partition top-k then a k-row driver merge,
    never a global sort). Integer arithmetic end to end (floor division of
    the 60-bit md5 integer by the token count, doc_id tie-break), so the
    oracle replays the exact sample — no rand(), resumable, and the same
    K rows come back on any retry or engine."""
    words = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
    # integer `div`, not `/`: double division truncates off the exact
    # quotient by a ulp for 60-bit numerators (caught by the canary —
    # priority 1176842702324858 vs DuckDB's exact ...857). Both operands
    # are non-negative, so div == DuckDB's floor //.
    pri = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        " div size(split(regexp_replace(trim(text), '\\\\s+', ' '), ' '))"
    )
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.size(words).cast("int").alias("n_tokens"),
            pri.alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
    )


PIPE_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, lang,
       CAST(len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS INT)
         AS n_tokens,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         // len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
         AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


PIPELINE_QUERIES.update(
    {
        # staged r11: deterministic weighted bottom-k sample
        "pipe_weighted_sample": (pipe_weighted_sample, PIPE_WEIGHTED_SAMPLE_SQL),
    }
)


COMPACT_TARGET_ROWS = 200  # rows per output file for the gate corpus


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
    sort_col: str | None = None,
) -> int:
    """Small-files compaction (the OPTIMIZE table-maintenance pass): read a
    fragmented parquet directory and rewrite it as ceil(n/target) files —
    a 100 TB lake ingested by streaming micro-batches accretes thousands
    of KB-sized files per partition, and every downstream scan then pays
    per-file open/footer costs that dwarf the data read. With ``sort_col``
    the rewrite is repartitionByRange + sortWithinPartitions (preserves /
    establishes clustering, so min-max file pruning works after the
    compaction — rewriting WITHOUT re-sorting destroys any zorder/sort
    layout, the classic compaction mistake); without it a plain
    repartition round-robins for even sizes. Returns the output file
    count. One count job + one full rewrite — both linear, no driver
    collection."""
    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    out = (
        df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
        if sort_col is not None
        else df.repartition(n_files)
    )
    out.write.mode("overwrite").parquet(dst_path)
    import os as _os

    return sum(
        1
        for f in _os.listdir(dst_path)
        if f.endswith(".parquet") and not f.startswith("_")
    )


def pipe_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: fragment the documents table into 64 tiny files,
    compact with a doc_id range-sort, and return the compacted CONTENT —
    value-matched against the original table, so a compaction that drops,
    duplicates, or corrupts rows hash-mismatches (the invariant that
    matters: compaction must be a pure layout change). File-count
    effectiveness (64 -> 3 at the gate corpus) is pinned in
    tests/test_r11_ops.py; the content is the oracle's job."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="dgds_compact_")
    frag, compacted = f"{base}/frag", f"{base}/compacted"
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    compact_parquet(spark, frag, compacted, COMPACT_TARGET_ROWS, sort_col="doc_id")
    out = (
        spark.read.parquet(compacted)
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


PIPE_COMPACT_FILES_SQL = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM documents
"""


PIPELINE_QUERIES.update(
    {
        # staged r11: small-files compaction (layout-only rewrite)
        "pipe_compact_files": (pipe_compact_files, PIPE_COMPACT_FILES_SQL),
    }
)


# --- BPE-counted packing (the real-tokenizer composition) ------------------


def pipe_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing driven by REAL subword token counts: every doc's
    BPE length (``text_analysis.text_bpe_encode`` — the checked-in merge
    table, not the regex approximation) becomes its packing weight, then
    :func:`pack_sequences_df` lays docs end-to-end and cuts every
    ``SEQ_LEN`` tokens. This is the production dataloader composition —
    token budgets and cut points computed from the tokenizer the model
    will actually see — and the oracle recomputes the BPE length with the
    generated golden-table encoding inside the same packing CTE, so
    the certified artifact is the COMPOSITION (tokenize -> pack), not the
    stages in isolation."""
    from .text_analysis import text_bpe_encode

    enc = text_bpe_encode(spark, sf_dir).select(
        "doc_id",
        F.lit(0).cast("int").alias("chunk_id"),
        F.col("n_bpe").cast("int").alias("n_tokens"),
    )
    return pack_sequences_df(enc)


def _pack_bpe_sql() -> str:
    from ..functions.bpe import SEP, bpe_enc_ctes

    return f"""
WITH {bpe_enc_ctes()},
chunks AS (
  SELECT doc_id, CAST(0 AS INT) AS chunk_id,
         CAST(CASE WHEN norm = '' THEN 0
              ELSE length(s) - length(replace(s, '{SEP}', '')) END AS INT)
           AS n_tokens
  FROM enc
),
keyed AS (
  SELECT doc_id, chunk_id, n_tokens,
         CAST((doc_id * {_XXPRIME}) % {N_SHARDS} AS INT) AS shard,
         (doc_id * {_KNUTH}) % {_ORDER_MOD} AS scr
  FROM chunks
),
cum AS (
  SELECT doc_id, chunk_id, n_tokens, shard,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY scr, doc_id, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM keyed
)
SELECT doc_id, chunk_id, shard,
       CAST(c // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(c % {SEQ_LEN} AS INT) AS seq_offset,
       n_tokens
FROM cum
"""


PIPE_PACK_BPE_SQL = _pack_bpe_sql()


PIPELINE_QUERIES.update(
    {
        # r12: packing weighted by the real BPE tokenizer's counts
        "pipe_pack_bpe": (pipe_pack_bpe, PIPE_PACK_BPE_SQL),
        # r12 (staged r13): budget admission in real BPE tokens
        "pipe_token_budget_bpe": (
            pipe_token_budget_bpe,
            PIPE_TOKEN_BUDGET_BPE_SQL,
        ),
    }
)


# --- weight-proportional source interleaving --------------------------------

INTERLEAVE_WEIGHTS = {"de": 1, "en": 4, "es": 2, "fr": 2, "zh": 1}
INTERLEAVE_SCALE = 1_000_000


def interleave_sources_df(
    docs: DataFrame, weights: dict[str, int], key: str = "lang"
) -> DataFrame:
    """Deterministic weight-proportional interleaving of sources — the
    training-order pass AFTER mixture selection: a weight-4 group must
    appear 4x as often as a weight-1 group THROUGHOUT the stream, not
    just in total (gradient stability wants locally-balanced mixing, the
    same virtual-time scheme as weighted fair queueing). The doc with
    within-group rank r (1-based, deterministic Knuth-scramble order)
    gets ``vt_micro = r * SCALE // w``; the global order is
    (vt_micro, key, doc_id) ascending.

    Scale: vt is a pure function of (within-group rank, weight), so the
    operator never materializes a global sort — the dataloader consumes
    the order as a k-way merge of per-group rank-ordered streams. The
    rank itself reuses the (key, sub) range-bucketed recomposition of
    :func:`cap_per_source_df` (giant groups never serialize through one
    window task). Groups absent from ``weights`` are dropped (weight 0).

    Returns ``(doc_id, <key>, rank, vt_micro)`` — rank 0-based within
    group."""
    from pyspark.sql import Window

    w_items = sorted(weights.items())
    wcol = F.lit(None).cast("long")
    for g, wt in w_items:
        wcol = F.when(F.col(key) == g, F.lit(int(wt))).otherwise(wcol)
    scramble = F.pmod(F.col("doc_id") * _KNUTH, F.lit(_ORDER_MOD))
    keyed = (
        docs.select("doc_id", key)
        .withColumn("_w", wcol)
        .where(F.col("_w").isNotNull())
        .withColumn("_scr", scramble)
        .withColumn("_sub", F.expr(f"_scr div {_SUB_WIDTH}").cast("int"))
    )
    w_rank = Window.partitionBy(key, "_sub").orderBy("_scr", "doc_id")
    ranked = keyed.withColumn("_rn", F.row_number().over(w_rank))
    w_off = (
        Window.partitionBy(key)
        .orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        keyed.groupBy(key, "_sub")
        .agg(F.count("*").alias("cnt"))
        .withColumn("_off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select(key, "_sub", "_off")
    )
    rn = F.col("_off") + F.col("_rn")  # 1-based recomposed within-group rank
    return (
        ranked.join(F.broadcast(offsets), [key, "_sub"])
        .select(
            "doc_id",
            key,
            (rn - 1).cast("bigint").alias("rank"),
            F.expr(f"(_off + _rn) * {INTERLEAVE_SCALE} div _w")
            .cast("bigint")
            .alias("vt_micro"),
        )
    )


def pipe_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional language interleaving over documents
    (:func:`interleave_sources_df`, en:4 fr:2 es:2 de:1 zh:1). The oracle
    recomputes the recomposed within-group rank as a plain per-group
    window over the same (scramble, doc_id) order — certifying the
    sub-bucket offset algebra — and the virtual-time integer division."""
    return interleave_sources_df(_docs(spark, sf_dir, spread=False), INTERLEAVE_WEIGHTS)


def _interleave_sql() -> str:
    vals = ", ".join(f"('{g}', {wt})" for g, wt in sorted(INTERLEAVE_WEIGHTS.items()))
    return f"""
WITH w(lang, wt) AS (VALUES {vals}),
scr AS (
  SELECT doc_id, lang, (doc_id * {_KNUTH}) % {_ORDER_MOD} AS s
  FROM documents
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY s, doc_id) AS rn
  FROM scr
)
SELECT r.doc_id, r.lang,
       CAST(r.rn - 1 AS BIGINT) AS rank,
       CAST(r.rn * {INTERLEAVE_SCALE} // w.wt AS BIGINT) AS vt_micro
FROM ranked r JOIN w USING (lang)
"""


PIPE_INTERLEAVE_SOURCES_SQL = _interleave_sql()


PIPELINE_QUERIES.update(
    {
        # r12 (staged r13): weight-proportional source interleaving
        "pipe_interleave_sources": (
            pipe_interleave_sources,
            PIPE_INTERLEAVE_SOURCES_SQL,
        ),
    }
)


# --- packed-sequence segment boundaries (attention segmentation) ------------


def pack_segments_df(packed: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-sequence SEGMENT table from a packed layout — the structure a
    packed dataloader feeds the model: which (doc, chunk) occupies which
    token range of each fixed-length sequence, so attention can be
    block-diagonal per document and position ids reset at segment starts.

    A chunk starting at global token g = seq_id*L + seq_offset with n
    tokens overlaps sequences seq_id .. (g+n-1) div L; its slice of
    sequence s covers in-sequence tokens
    [max(g, s*L) - s*L, min(g+n-1, (s+1)*L - 1) - s*L]. The explode is
    bounded by ceil(n/L)+1 rows per chunk — output-proportional, pure
    narrow map over the packed table (integer arithmetic only, no extra
    shuffle beyond what packing already did)."""
    L = F.lit(seq_len)
    g = F.col("seq_id") * L + F.col("seq_offset")
    g_end = g + F.col("n_tokens") - 1
    seqs = F.sequence(F.col("seq_id"), F.expr(f"(seq_id * {seq_len} + seq_offset + n_tokens - 1) div {seq_len}"))
    return (
        packed.where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "chunk_id",
            "shard",
            g.alias("_g"),
            g_end.alias("_ge"),
            F.explode(seqs).alias("seq_id"),
        )
        .select(
            "shard",
            "seq_id",
            "doc_id",
            "chunk_id",
            (F.greatest(F.col("_g"), F.col("seq_id") * L) - F.col("seq_id") * L)
            .cast("int")
            .alias("seg_start"),
            (F.least(F.col("_ge"), F.col("seq_id") * L + (seq_len - 1)) - F.col("seq_id") * L)
            .cast("int")
            .alias("seg_end"),
        )
    )


def pipe_pack_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment boundaries over the packed chunk layout
    (:func:`pack_segments_df` on :func:`pipe_pack_sequences`'s output).
    The oracle replays the packing CTE and derives the same overlap
    algebra with a range() explode — every boundary integer certifies."""
    return pack_segments_df(pack_sequences_df(chunk_windows_df(_docs(spark, sf_dir, spread=False))))


PIPE_PACK_SEGMENTS_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
dims AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= {CHUNK} THEN 1
              ELSE CAST((len(w) - {CHUNK} + {STRIDE - 1}) // {STRIDE} AS INT) + 1
         END AS n_chunks
  FROM docs
),
exploded AS (
  SELECT doc_id, w, CAST(UNNEST(range(n_chunks)) AS INT) AS chunk_id FROM dims
),
chunks AS (
  SELECT doc_id, chunk_id,
         CAST(len(w[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK}]) AS INT) AS n_tokens
  FROM exploded
),
keyed AS (
  SELECT doc_id, chunk_id, n_tokens,
         CAST((doc_id * {_XXPRIME}) % {N_SHARDS} AS INT) AS shard,
         (doc_id * {_KNUTH}) % {_ORDER_MOD} AS scr
  FROM chunks
),
cum AS (
  SELECT doc_id, chunk_id, n_tokens, shard,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY scr, doc_id, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g
  FROM keyed
),
seg AS (
  SELECT shard, CAST(s AS BIGINT) AS seq_id, doc_id, chunk_id,
         greatest(g, s * {SEQ_LEN}) - s * {SEQ_LEN} AS seg_start,
         least(g + n_tokens - 1, s * {SEQ_LEN} + {SEQ_LEN - 1}) - s * {SEQ_LEN} AS seg_end
  FROM cum, UNNEST(range(CAST(g // {SEQ_LEN} AS BIGINT),
                         CAST((g + n_tokens - 1) // {SEQ_LEN} + 1 AS BIGINT))) AS u(s)
  WHERE n_tokens > 0
)
SELECT shard, seq_id, doc_id, chunk_id,
       CAST(seg_start AS INT) AS seg_start,
       CAST(seg_end AS INT) AS seg_end
FROM seg
"""


PIPELINE_QUERIES.update(
    {
        # r12 (staged r13): packed-sequence segment boundaries
        "pipe_pack_segments": (pipe_pack_segments, PIPE_PACK_SEGMENTS_SQL),
    }
)


# --- interleave -> pack -> segments (the consumed composition) --------------

# vt_micro sub-bucket width for the interleaved-stream cumsum recomposition:
# vt is monotone in the global WFQ order, so bucketing by `vt div WIDTH`
# parallelizes the running token total exactly like the scramble-bucketed
# packing cumsum. Bucket count grows with the corpus (vt_max ~ rank * SCALE
# / w), so the stage's parallelism scales with data instead of capping.
_VT_SUB_WIDTH = 50_000_000


def interleave_pack_segments_df(
    docs: DataFrame, weights: dict[str, int], seq_len: int = SEQ_LEN
) -> DataFrame:
    """The composition a training job actually consumes (r12 verdict #6):
    weight-proportional WFQ interleaving (:func:`interleave_sources_df`)
    fixes the GLOBAL training order; documents are laid end-to-end IN THAT
    ORDER weighted by their REAL BPE token counts
    (:func:`text_analysis.bpe_encode_df`), cut every ``seq_len`` tokens,
    and emitted as the per-sequence segment table
    (:func:`pack_segments_df` algebra, with the interleave key and virtual
    time carried through) — certifying that the WFQ order SURVIVES the
    pack: a doc's sequence position is monotone in its virtual time.

    Unlike :func:`pack_sequences_df` (per-shard streams), the interleaved
    stream is ONE global order, so the running token total uses vt-bucket
    recomposition: cumsum per ``vt_micro div _VT_SUB_WIDTH`` bucket (vt is
    monotone in the global order), plus a broadcast per-bucket offset —
    no global sort, no single-task window over the corpus; the only
    corpus-wide single-task window runs over <= #buckets aggregate rows.

    Returns ``(seq_id, doc_id, lang, vt_micro, seg_start, seg_end)``."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from .text_analysis import bpe_encode_df

    inter = interleave_sources_df(docs, weights)  # doc_id, lang, rank, vt_micro
    toks = bpe_encode_df(docs).select(
        "doc_id", F.col("n_bpe").cast("int").alias("n_tokens")
    )
    # Persist the keyed projection: BOTH the in-bucket cumsum and the
    # per-bucket offsets consume it, and without this the whole upstream —
    # including the BPE tokenizer's MapInPandas — executes twice (caught
    # in the r13 plan audit). Five narrow columns per doc (~40 bytes), so
    # the materialization is corpus-row- not corpus-byte-proportional;
    # MEMORY_AND_DISK spills instead of recomputing.
    keyed = (
        inter.join(toks, "doc_id")
        .withColumn("_sub", F.expr(f"vt_micro div {_VT_SUB_WIDTH}").cast("int"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    order = ["vt_micro", "lang", "doc_id"]
    w_cum = (
        Window.partitionBy("_sub")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_sub = keyed.withColumn(
        "_cin", F.coalesce(F.sum("n_tokens").over(w_cum), F.lit(0))
    )
    # per-bucket totals -> cumulative start offsets; <= #buckets rows, so
    # the unpartitioned window is a deliberate tiny single task
    w_off = Window.orderBy("_sub").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        keyed.groupBy("_sub")
        .agg(F.sum("n_tokens").alias("_tok"))
        .withColumn("_off", F.coalesce(F.sum("_tok").over(w_off), F.lit(0)))
        .select("_sub", "_off")
    )
    g = F.col("_off") + F.col("_cin")
    packed = in_sub.join(F.broadcast(offsets), "_sub").select(
        "doc_id",
        "lang",
        "vt_micro",
        "n_tokens",
        g.alias("_g"),
    )
    # segment explode: same overlap algebra as pack_segments_df, with the
    # interleave columns carried through (output-proportional, narrow)
    L = F.lit(seq_len)
    seqs = F.sequence(
        F.expr(f"_g div {seq_len}"),
        F.expr(f"(_g + n_tokens - 1) div {seq_len}"),
    )
    return (
        packed.where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "lang",
            "vt_micro",
            F.col("_g"),
            (F.col("_g") + F.col("n_tokens") - 1).alias("_ge"),
            F.explode(seqs).alias("seq_id"),
        )
        .select(
            F.col("seq_id").cast("bigint").alias("seq_id"),
            "doc_id",
            "lang",
            "vt_micro",
            (F.greatest(F.col("_g"), F.col("seq_id") * L) - F.col("seq_id") * L)
            .cast("int")
            .alias("seg_start"),
            (
                F.least(F.col("_ge"), F.col("seq_id") * L + (seq_len - 1))
                - F.col("seq_id") * L
            )
            .cast("int")
            .alias("seg_end"),
        )
    )


def pipe_interleave_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the interleave -> BPE-pack -> segments composition
    over documents. The oracle replays all three stages in one query —
    WFQ rank/virtual-time algebra, the golden-table BPE token counts, the
    global running total, and the segment overlap integers — so the hash
    certifies the COMPOSITION (stable order surviving the pack), which is
    what the dataloader consumes."""
    return interleave_pack_segments_df(_docs(spark, sf_dir), INTERLEAVE_WEIGHTS)


def _interleave_pack_tail_sql() -> str:
    """The interleave -> pack -> segments CTE chain downstream of the BPE
    ``enc`` CTE (tok..seg + final SELECT), shared verbatim by the
    standalone oracle and the composed corpus-clean pipeline oracle —
    one copy of the WFQ/virtual-time/segment algebra."""
    from ..functions.bpe import SEP

    vals = ", ".join(f"('{g}', {wt})" for g, wt in sorted(INTERLEAVE_WEIGHTS.items()))
    return f"""tok AS (
  SELECT doc_id, lang,
         CAST(CASE WHEN norm = '' THEN 0
              ELSE length(s) - length(replace(s, '{SEP}', '')) END AS INT)
           AS n_tokens
  FROM enc
),
w(lang, wt) AS (VALUES {vals}),
scr AS (
  SELECT doc_id, lang, n_tokens, (doc_id * {_KNUTH}) % {_ORDER_MOD} AS sc
  FROM tok
),
ranked AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY sc, doc_id) AS rn
  FROM scr
),
vt AS (
  SELECT r.doc_id, r.lang, r.n_tokens,
         CAST(r.rn * {INTERLEAVE_SCALE} // w.wt AS BIGINT) AS vt_micro
  FROM ranked r JOIN w USING (lang)
),
cum AS (
  SELECT doc_id, lang, vt_micro, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY vt_micro, lang, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g
  FROM vt
),
seg AS (
  SELECT CAST(u.s AS BIGINT) AS seq_id, doc_id, lang, vt_micro,
         greatest(g, u.s * {SEQ_LEN}) - u.s * {SEQ_LEN} AS seg_start,
         least(g + n_tokens - 1, u.s * {SEQ_LEN} + {SEQ_LEN - 1})
           - u.s * {SEQ_LEN} AS seg_end
  FROM cum, UNNEST(range(CAST(g // {SEQ_LEN} AS BIGINT),
                         CAST((g + n_tokens - 1) // {SEQ_LEN} + 1 AS BIGINT))) AS u(s)
  WHERE n_tokens > 0
)
SELECT seq_id, doc_id, lang, vt_micro,
       CAST(seg_start AS INT) AS seg_start,
       CAST(seg_end AS INT) AS seg_end
FROM seg
"""


def _interleave_pack_sql(table: str = "documents") -> str:
    from ..functions.bpe import bpe_enc_ctes

    return f"""
WITH {bpe_enc_ctes(cols="lang", table=table)},
{_interleave_pack_tail_sql()}"""


PIPE_INTERLEAVE_PACK_SQL = _interleave_pack_sql()


PIPELINE_QUERIES.update(
    {
        # r13 (staged r14): the interleave -> BPE-pack -> segments
        # composition (WFQ order surviving the pack, certified end to end)
        "pipe_interleave_pack": (pipe_interleave_pack, PIPE_INTERLEAVE_PACK_SQL),
    }
)


def snapshot_diff_df(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Crawl-over-crawl dataset diff — the version-control primitive an
    incremental training pipeline runs before anything else: which
    documents are added / removed / changed / unchanged since the last
    snapshot, per source, so downstream stages (dedup, tokenize, pack)
    touch only the changed partitions instead of recrawling 100 TB.

    Scale shape: both sides are projected to (doc_id, source,
    md5(text), length) BEFORE the join — the full-outer hash join on the
    uniform doc_id key ships 3 narrow columns, never the text. The
    content compare is digest equality (the same engine-portable md5
    convention as :func:`cdc_chunks_df`), so a changed 1 MB document
    costs the same as a changed 1-byte one. Output is a
    |sources| x 4-status aggregate — constant egress at any corpus size.

    Returns (source, status, n_docs, chars_delta) where ``chars_delta``
    is the net character growth this status contributes (added counts
    full length, removed counts negative full length, changed counts the
    length difference).
    """
    def _digest(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            "source",
            F.md5("text").alias("h"),
            F.length("text").cast("bigint").alias("len"),
        )

    a = _digest(v1).alias("a")
    b = _digest(v2).alias("b")
    joined = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("b.source"), F.col("a.source")).alias("source"),
            status.alias("status"),
            (
                F.coalesce(F.col("b.len"), F.lit(0))
                - F.coalesce(F.col("a.len"), F.lit(0))
            ).alias("delta"),
        )
        .groupBy("source", "status")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("delta").cast("bigint").alias("chars_delta"),
        )
    )


def _snapshot_v2(docs: DataFrame) -> DataFrame:
    """The deterministic 'next crawl' both engines reconstruct: docs with
    doc_id % 17 == 0 dropped (removed), % 13 == 0 get a revision suffix
    (changed), % 19 == 0 reappear re-keyed as ``-doc_id - 1`` (added) —
    the negative mirror can never collide with a real id at ANY corpus
    size, unlike an additive offset (the +10M re-key this replaced would
    alias real ids on a >10M-doc corpus and silently corrupt every
    certificate built on the snapshot). Keep in sync with
    :data:`SNAPSHOT_V2_SQL`, the single SQL fragment every oracle that
    reconstructs v2 embeds."""
    base = docs.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.where(F.col("doc_id") % 19 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"), "source", "text"
    )
    return base.unionByName(added)


# The ONE SQL reconstruction of _snapshot_v2 (doc_id, source, text, status)
# — embedded by every oracle that compares against the next crawl
# (snapshot diff, incremental quality, streaming crawl ingest), so the
# synthesis rule cannot drift between certificates.
SNAPSHOT_V2_SQL = """
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS text,
         CASE WHEN doc_id % 13 = 0 THEN 'recomputed' ELSE 'carried' END AS status
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT -doc_id - 1 AS doc_id, source, text, 'recomputed' AS status
  FROM documents WHERE doc_id % 19 = 0
"""


def pipe_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between the documents corpus and its deterministic
    'next crawl' (:func:`snapshot_diff_df` over :func:`_snapshot_v2`)."""
    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "source", "text")
    return snapshot_diff_df(docs, _snapshot_v2(docs))


PIPE_SNAPSHOT_DIFF_SQL = f"""
WITH v1 AS (SELECT doc_id, source, text FROM documents),
v2 AS ({SNAPSHOT_V2_SQL}),
a AS (SELECT doc_id, source, md5(text) AS h, CAST(length(text) AS BIGINT) AS len FROM v1),
b AS (SELECT doc_id, source, md5(text) AS h, CAST(length(text) AS BIGINT) AS len FROM v2),
j AS (
  SELECT COALESCE(b.source, a.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.h <> b.h THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(b.len, 0) - COALESCE(a.len, 0) AS delta
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT source, status,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(delta) AS BIGINT) AS chars_delta
FROM j GROUP BY source, status
"""


PIPELINE_QUERIES.update(
    {
        # r13 (staged r14): crawl-over-crawl dataset version diff
        "pipe_snapshot_diff": (pipe_snapshot_diff, PIPE_SNAPSHOT_DIFF_SQL),
    }
)


def incremental_quality_df(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """The incremental-pipeline equivalence certificate: score ONLY the
    docs the new snapshot changed or added (digest-routed, same md5
    compare as :func:`snapshot_diff_df`), carry forward the previous
    snapshot's scores for digest-identical docs, drop removed docs — and
    the merged result must equal full reprocessing of v2. That equality
    is the contract every incremental 100 TB pipeline stands on (process
    the delta, not the corpus); per-doc pure stages make it hold
    mathematically, and this operator certifies the ROUTING bookkeeping
    (a misrouted doc flips its status, a lost tombstone resurrects a row,
    a stale carry ships the old text's score).

    Returns (doc_id, status, n_words, quality_micro) for every v2 doc,
    status in {'carried', 'recomputed'}."""
    from .text_analysis import quality_score_df

    from pyspark.storagelevel import StorageLevel

    a = v1.select("doc_id", F.md5("text").alias("h1"))
    b = v2.select("doc_id", "text", F.md5("text").alias("h2"))
    # Two consumers (recompute branch, carried-ids branch) — without the
    # cache the digest join and both full-corpus md5 scans beneath it run
    # once per consumer (r13 double-execute audit). Corpus-row bounded,
    # narrow columns + text; spills, never recomputes.
    routed = b.join(a, "doc_id", "left").persist(StorageLevel.MEMORY_AND_DISK)
    recompute = routed.where(
        F.col("h1").isNull() | (F.col("h1") != F.col("h2"))
    ).select("doc_id", "text")
    carried_ids = routed.where(F.col("h1") == F.col("h2")).select("doc_id")
    # Carried scores come from the V1 side (the cached score store of a
    # real pipeline); digest equality guarantees they equal v2's.
    carried = quality_score_df(
        v1.join(carried_ids, "doc_id").select("doc_id", "text")
    ).withColumn("status", F.lit("carried"))
    fresh = quality_score_df(recompute).withColumn("status", F.lit("recomputed"))
    return carried.unionByName(fresh).select(
        "doc_id",
        "status",
        "n_words",
        F.round(F.col("quality") * 1e6).cast("bigint").alias("quality_micro"),
    )


def pipe_incremental_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental quality scoring across the deterministic next-crawl
    snapshot (:func:`incremental_quality_df` over :func:`_snapshot_v2`)."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    return incremental_quality_df(docs, _snapshot_v2(docs))


# The oracle reprocesses v2 IN FULL — the incremental path must match it
# doc-for-doc — and derives each doc's expected route from the snapshot
# construction rules the Spark side never consults (it routes by digest).
def _incremental_quality_sql() -> str:
    """Oracle assembled from the TWO single-source fragments: the
    snapshot reconstruction (:data:`SNAPSHOT_V2_SQL` — which also
    derives each doc's expected route from the synthesis rules the Spark
    side never consults) and the quality definition
    (``text_analysis.quality_measures_ctes`` + score expression), so a
    change to either is certified here automatically instead of drifting
    past a copy."""
    from .text_analysis import QUALITY_SCORE_EXPR_SQL, quality_measures_ctes

    return f"""
WITH v2 AS ({SNAPSHOT_V2_SQL}),
{quality_measures_ctes("v2", carry="status")}
SELECT doc_id, status,
       CAST(n_words AS INT) AS n_words,
       CAST(round(1e6 * ({QUALITY_SCORE_EXPR_SQL}
       )) AS BIGINT) AS quality_micro
FROM m
"""


PIPE_INCREMENTAL_QUALITY_SQL = _incremental_quality_sql()


PIPELINE_QUERIES.update(
    {
        # r13 (staged r14): incremental == full reprocessing certificate
        "pipe_incremental_quality": (
            pipe_incremental_quality,
            PIPE_INCREMENTAL_QUALITY_SQL,
        ),
    }
)


def corpus_clean_pack_df(
    spark: SparkSession,
    docs: DataFrame,
    weights: dict[str, int],
    seq_len: int = SEQ_LEN,
) -> DataFrame:
    """The full C4-style corpus pipeline in ONE DAG (r13 verdict #4) —
    what a real training-data job runs end to end, each stage consuming
    the PREVIOUS stage's output, never the raw corpus:

        1. cross-doc boilerplate-sentence removal
           (:func:`dedup.boilerplate_scrub_text_df`)
        2. exact-substring scrub of >= 50-token cross-doc runs over the
           DE-BOILERPLATED text (:func:`dedup.scrub_dup_spans_df`)
        3. near-dup clustering of the SCRUBBED corpus, keeping the
           quality-argmax representative per cluster plus every
           unclustered doc (the production survivor rule of
           :func:`dedup.dedup_cluster_representatives_df`, quality
           measured on the stage-2 text)
        4. WFQ interleave -> BPE-pack -> segment table
           (:func:`interleave_pack_segments_df`) over the survivors

    Composition IS the contract: boilerplate removal changes which
    50-grams repeat, scrubbing changes shingles and quality, survivor
    choice changes the interleave ranks, and every BPE token count
    shifts every downstream segment boundary — so the oracle replaying
    all four stages certifies the stage WIRING, not just each stage.

    Scale shape is the sum of its certified parts: sentence-key and
    gram-key partial aggregates (map-side combined), candidate-
    proportional span semi-join, banded-LSH pairs + checkpointed
    min-label loop over paired docs only, one quality argmax aggregate
    per cluster, vt-bucketed cumsum pack — nothing quadratic, nothing
    corpus-sized through a single task.

    Returns ``(seq_id, doc_id, lang, vt_micro, seg_start, seg_end)``."""
    from .dedup import (
        EXACT_SUBSTR_TOKENS,
        boilerplate_scrub_text_df,
        dedup_clusters_df,
        scrub_dup_spans_df,
    )
    from .text_analysis import quality_score_df

    stage1 = boilerplate_scrub_text_df(docs)
    scrubbed = scrub_dup_spans_df(
        stage1, k=EXACT_SUBSTR_TOKENS, min_occurrences=2, cross_doc=True
    )
    # Stage-2 output feeds FOUR consumers (cluster pair-finder, quality,
    # survivor anti-join/semi-join, the BPE pack) — materialize the narrow
    # (doc_id, lang, text) projection so stages 1-2 run once. An eager
    # localCheckpoint, not a persist (r16): a persist substitutes the cached
    # blocks only at PHYSICAL planning, so every consumer still re-analyzes
    # and re-optimizes the whole boilerplate+scrub logical tree — with four
    # consumers stacked into one final DAG that driver-side planning cost
    # measured 11.3 s warm / 22.7 s cold vs 8.0 s / 8.3 s with the
    # truncated plan (identical rows). Same barrier discipline as
    # dedup_clusters_df's edge checkpoint.
    docs2 = (
        scrubbed.select("doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .localCheckpoint(eager=True)
    )
    clusters = dedup_clusters_df(spark, docs2).select("doc_id", "cluster_id")
    # Score ONLY cluster members: a fully-scrubbed doc has empty text
    # (n_chars = 0 -> ANSI divide-by-zero in the quality formula) but can
    # never be a cluster member (pairs need >= 3 shared words), so the
    # semi-join both avoids the division and shrinks the scoring input to
    # the paired docs.
    members = quality_score_df(
        docs2.join(clusters, "doc_id", "left_semi")
    ).select("doc_id", "quality").join(clusters, "doc_id")
    reps = (
        members.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("quality"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("b")
        )
        .select((-F.col("b.neg_id")).cast("bigint").alias("doc_id"))
    )
    survivors = docs2.join(clusters, "doc_id", "left_anti").unionByName(
        docs2.join(reps, "doc_id", "left_semi")
    )
    return interleave_pack_segments_df(survivors, weights, seq_len)


def pipe_corpus_clean_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the boilerplate -> substring-scrub -> near-dup-
    representative -> interleave/pack composition over documents
    (:func:`corpus_clean_pack_df`)."""
    return corpus_clean_pack_df(spark, _docs(spark, sf_dir), INTERLEAVE_WEIGHTS)


def _corpus_clean_pack_sql() -> str:
    """One oracle replaying all four stages: the boilerplate sentence
    reconstruction (dedup.DEDUP_BOILERPLATE_SQL semantics), the >= 50-token
    cross-doc scrub (dedup.DEDUP_SCRUB_SUBSTRING_SQL semantics), the
    exact-Jaccard cluster walk + quality argmax
    (dedup.DEDUP_CLUSTER_REPRESENTATIVES_SQL semantics), and the shared
    interleave-pack tail (:func:`_interleave_pack_tail_sql`, verbatim the
    standalone entry's algebra) over a ``stage3`` CTE instead of the raw
    table."""
    from ..functions.bpe import bpe_enc_ctes
    from .dedup import BOILER_MIN_DOCS, EXACT_SUBSTR_TOKENS
    from .text_analysis import QUALITY_SCORE_EXPR_SQL

    k = EXACT_SUBSTR_TOKENS
    return f"""
WITH RECURSIVE bp_raw AS (
  SELECT doc_id, lang,
         list_transform(regexp_split_to_array(text, '[.!?]+'),
                        x -> trim(x)) AS parts
  FROM documents
),
bp_idx AS (
  SELECT doc_id, lang,
         list_filter(list_transform(range(1, len(parts) + 1),
                     i -> struct_pack(pos := i, s := parts[i])),
                     x -> x.s <> '') AS sents
  FROM bp_raw
),
bp_flat AS (
  SELECT doc_id, u.pos AS pos, u.s AS s,
         regexp_replace(trim(lower(u.s)), '\\s+', ' ', 'g') AS norm
  FROM bp_idx, UNNEST(sents) AS t(u)
),
bp_boiler AS (
  SELECT norm FROM (SELECT DISTINCT norm, doc_id FROM bp_flat)
  GROUP BY norm HAVING COUNT(*) >= {BOILER_MIN_DOCS}
),
bp_kept AS (
  SELECT f.doc_id, string_agg(f.s, chr(10) ORDER BY f.pos) AS t1
  FROM bp_flat f ANTI JOIN bp_boiler b ON f.norm = b.norm
  GROUP BY f.doc_id
),
stage1 AS MATERIALIZED (
  SELECT r.doc_id, r.lang, COALESCE(k.t1, '') AS text
  FROM bp_raw r LEFT JOIN bp_kept k USING (doc_id)
),
sc_docs AS (
  SELECT doc_id, lang,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM stage1
),
sc_grams AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(list_slice(w, i, i + {k - 1}), ' ') AS gram
  FROM sc_docs, LATERAL (SELECT unnest(range(1, len(w) - {k - 2})) AS i)
  WHERE len(w) >= {k}
),
sc_dup AS (
  SELECT gram FROM sc_grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
sc_dp AS (
  SELECT g.doc_id, g.pos, g.pos + {k - 1} AS e
  FROM sc_grams g JOIN sc_dup USING (gram)
),
sc_pm AS (
  SELECT doc_id, pos, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM sc_dp
),
sc_isl AS (
  SELECT doc_id, pos, e,
         sum(CASE WHEN prev_max IS NULL OR pos > prev_max + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM sc_pm
),
sc_spans AS (
  SELECT doc_id, min(pos) AS a, max(e) AS b
  FROM sc_isl GROUP BY doc_id, island
),
sc_sp AS (
  SELECT doc_id, list(struct_pack(a := a, b := b)) AS spans
  FROM sc_spans GROUP BY doc_id
),
stage2 AS MATERIALIZED (
  SELECT d.doc_id, d.lang,
         CASE WHEN s.spans IS NULL THEN d.t
              ELSE COALESCE(array_to_string(
                     list_filter(d.w, (x, i) ->
                       len(list_filter(s.spans,
                           v -> (i - 1) >= v.a AND (i - 1) <= v.b)) = 0),
                     ' '), '')
         END AS text
  FROM sc_docs d LEFT JOIN sc_sp s USING (doc_id)
),
cl_docs AS MATERIALIZED (
  SELECT doc_id, lang, text,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM stage2
),
cl_sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM cl_docs
  WHERE len(w) >= 3
),
cl_pre AS MATERIALIZED (
  SELECT doc_id, len(s) AS n_sh,
         unnest(list_sort(s)[1 : len(s) - CAST(ceil(len(s) * 0.5) AS BIGINT) + 1]) AS h
  FROM cl_sh
),
cl_cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cl_pre a JOIN cl_pre b
    ON a.h = b.h AND a.doc_id < b.doc_id
   AND b.n_sh >= a.n_sh * 0.5 AND a.n_sh >= b.n_sh * 0.5
),
cl_pairs AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b
  FROM cl_cand c JOIN cl_sh a ON a.doc_id = c.doc_a
                 JOIN cl_sh b ON b.doc_id = c.doc_b
  WHERE CAST(len(a.s) + len(b.s)
             - len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
),
cl_edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM cl_pairs
  UNION
  SELECT doc_b, doc_a FROM cl_pairs
),
cl_walk(doc_id, lbl) AS (
  SELECT src, src FROM cl_edges
  UNION
  SELECT e.dst, w.lbl FROM cl_walk w JOIN cl_edges e ON e.src = w.doc_id
),
cl_clusters AS MATERIALIZED (
  SELECT doc_id, MIN(lbl) AS cluster_id FROM cl_walk GROUP BY doc_id
),
cl_m AS (
  SELECT doc_id,
         CAST(len(w) AS DOUBLE) AS n_words,
         CAST(len(list_filter(w, x -> x IN
              ('the','a','of','is','and','to','in'))) AS DOUBLE) AS n_stop,
         CAST(length(t) AS DOUBLE) AS n_chars,
         CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g'))
              AS DOUBLE) AS n_alpha
  FROM cl_docs
),
cl_quality AS (
  SELECT doc_id, {QUALITY_SCORE_EXPR_SQL} AS quality
  FROM cl_m
),
cl_reps AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.quality DESC, c.doc_id ASC) AS rn
    FROM cl_clusters c JOIN cl_quality q USING (doc_id)
  ) WHERE rn = 1
),
stage3 AS MATERIALIZED (
  SELECT doc_id, lang, text FROM cl_docs
  WHERE doc_id NOT IN (SELECT doc_id FROM cl_clusters)
  UNION ALL
  SELECT d.doc_id, d.lang, d.text
  FROM cl_docs d JOIN cl_reps r USING (doc_id)
),
{bpe_enc_ctes(cols="lang", table="stage3")},
{_interleave_pack_tail_sql()}"""


PIPE_CORPUS_CLEAN_PACK_SQL = _corpus_clean_pack_sql()


PIPELINE_QUERIES.update(
    {
        # r14 (staged r15): the full C4-style corpus pipeline — four
        # certified stages wired output-to-input, one oracle
        "pipe_corpus_clean_pack": (
            pipe_corpus_clean_pack,
            PIPE_CORPUS_CLEAN_PACK_SQL,
        ),
    }
)
