"""Text-analysis operators over ``documents`` (north-star §2c).

The reference's only scalar function is a filename parse
(``primary_server.c:43-51``); these are the LLM-pipeline text primitives the
north star mandates. All four are pure JVM expression code (split /
higher-order array functions / regexp) — no Python UDFs in the hot path —
and each carries an exact DuckDB oracle:

- **language-ID** — deterministic marker-word scoring (a public stopword
  n-gram heuristic). The synthetic corpus shares one vocabulary across its
  ``lang`` labels, so the *predictions* are mostly 'en'; the operator
  contract is the deterministic heuristic itself, verified cross-engine.
- **quality score** — length / stopword-ratio / alpha-ratio / word-length
  components combined in a fixed arithmetic order (hash-stable doubles).
- **token count** — whitespace tokens + a BPE-ish regex token count.
- **fingerprint** — winnowing-style document fingerprint: min md5 over
  sliding 5-word windows (md5 is bit-identical across engines).

Scale posture: each operator is a single projection over the corpus —
embarrassingly parallel, no shuffle at all (narrow transformations only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread_small_scan

# Public-knowledge stopword markers per language (ISO codes sorted for the
# deterministic tie-break order).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist"],
    "en": ["the", "a", "of", "is", "and"],
    "es": ["el", "los", "que", "y", "una"],
    "fr": ["le", "les", "des", "et", "une"],
    "zh": ["de", "shi", "le", "bu", "zai"],
}

EN_STOPWORDS = ["the", "a", "of", "is", "and", "to", "in"]

WINDOW_W = 5  # fingerprint window width (words)

_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: one-file corpus -> one scan partition; tokenize/regex passes
    # before the first exchange would run single-task (guide §2.5).
    return spread_small_scan(load_table(spark, sf_dir, "documents"))


def _norm_text() -> Column:
    return F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")


def _words() -> Column:
    return F.split(_norm_text(), " ")


def _marker_count(words: Column, markers: list[str]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID: argmax of per-language marker counts.

    Ties (and the all-zero case) resolve to the alphabetically first
    language among the winners, 'und' (undetermined) when every score is 0 —
    the same CASE cascade in both engines.
    """
    docs = _docs(spark, sf_dir)
    words = _words()
    scored = docs.select(
        "doc_id",
        *[
            _marker_count(words, m).alias(f"s_{lang}")
            for lang, m in sorted(LANG_MARKERS.items())
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{la}") for la in langs])
    pred = F.when(best == 0, F.lit("und"))
    for la in langs:  # alphabetical => first max wins
        pred = pred.when(F.col(f"s_{la}") == best, F.lit(la))
    return scored.select(
        "doc_id", *[F.col(f"s_{la}") for la in langs], pred.alias("pred_lang")
    )


_LANG_SCORES_SQL = ",\n".join(
    "         len(list_filter(w, x -> x IN ({}))) AS s_{}".format(
        ", ".join(f"'{m}'" for m in markers), lang
    )
    for lang, markers in sorted(LANG_MARKERS.items())
)

TEXT_LANGUAGE_ID_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
scored AS (
  SELECT doc_id,
{_LANG_SCORES_SQL}
  FROM docs
)
SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END AS pred_lang
FROM scored
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, stopword ratio, alpha ratio.

    score = 0.25*min(n_words/100, 1) + 0.25*(1 - |stop_ratio - 0.4|)
          + 0.25*alpha_ratio + 0.25*min(avg_word_len/8, 1)
    evaluated left-to-right in both engines (bit-identical doubles).
    """
    return quality_score_df(_docs(spark, sf_dir))


def quality_score_df(docs: DataFrame) -> DataFrame:
    """df-level :func:`text_quality_score` for pipeline composition."""
    words = _words()
    n_words = F.size(words).cast("double")
    n_stop = _marker_count(words, EN_STOPWORDS).cast("double")
    n_chars = F.length(_norm_text()).cast("double")
    n_alpha = (
        n_chars - F.length(F.regexp_replace(_norm_text(), "[a-z]", ""))
    ).cast("double")
    avg_wlen = (n_chars - (n_words - 1)) / n_words
    stop_ratio = n_stop / n_words
    alpha_ratio = n_alpha / n_chars
    score = (
        F.lit(0.25) * F.least(n_words / 100.0, F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.abs(stop_ratio - 0.4))
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * F.least(avg_wlen / 8.0, F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        avg_wlen.alias("avg_word_len"),
        score.alias("quality"),
    )


def quality_measures_ctes(src: str, carry: str = "") -> str:
    """The quality formula's measurement CTEs (d -> m), parameterized by
    the source relation so composed oracles (e.g. incremental quality
    over a reconstructed snapshot) derive from THIS definition instead of
    copying it — one stopword list, one normalization, one formula.
    ``carry`` names extra columns to thread through both CTEs."""
    cc = ", " + carry if carry else ""
    return (
        "d AS (\n"
        "  SELECT doc_id" + cc + ",\n"
        "         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,\n"
        "         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w\n"
        "  FROM " + src + "\n"
        "),\n"
        "m AS (\n"
        "  SELECT doc_id" + cc + ",\n"
        "         CAST(len(w) AS DOUBLE) AS n_words,\n"
        "         CAST(len(list_filter(w, x -> x IN "
        "('the','a','of','is','and','to','in'))) AS DOUBLE) AS n_stop,\n"
        "         CAST(length(t) AS DOUBLE) AS n_chars,\n"
        "         CAST(length(t) - length(regexp_replace(t, '[a-z]', '', 'g')) "
        "AS DOUBLE) AS n_alpha\n"
        "  FROM d\n"
        ")"
    )


# The score expression over the m CTE's measures — the other half of the
# single-source-of-truth quality definition.
QUALITY_SCORE_EXPR_SQL = (
    "0.25 * least(n_words / 100.0, 1.0)\n"
    "     + 0.25 * (1.0 - abs(n_stop / n_words - 0.4))\n"
    "     + 0.25 * (n_alpha / n_chars)\n"
    "     + 0.25 * least(((n_chars - (n_words - 1)) / n_words) / 8.0, 1.0)"
)


TEXT_QUALITY_SCORE_SQL = f"""
WITH {quality_measures_ctes("documents")}
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       n_stop / n_words AS stop_ratio,
       n_alpha / n_chars AS alpha_ratio,
       (n_chars - (n_words - 1)) / n_words AS avg_word_len,
       {QUALITY_SCORE_EXPR_SQL} AS quality
FROM m
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(_words()).cast("bigint").alias("ws_tokens"),
        F.regexp_count(_norm_text(), F.lit(_TOKEN_RE)).cast("bigint").alias("re_tokens"),
        F.length(_norm_text()).cast("bigint").alias("n_chars_norm"),
    )


TEXT_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CAST(len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(regexp_replace(trim(text), '\\s+', ' ', 'g'), '{_TOKEN_RE}')) AS BIGINT) AS re_tokens,
       CAST(length(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS BIGINT) AS n_chars_norm
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over sliding 5-word windows.

    md5 hex digests compare identically in both engines, so the minimum
    window hash is an exact cross-engine fingerprint. Documents shorter than
    one window hash the whole normalized text.
    """
    # Bind the split to a column first: inlining it into each indexed access
    # would re-split the string WINDOW_W times per window (see dedup._shingled).
    docs = _docs(spark, sf_dir).select(
        "doc_id", _norm_text().alias("t"), F.split(_norm_text(), " ").alias("w")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("w") - (WINDOW_W - 1)),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at("w", i + j) for j in range(WINDOW_W)]
            )
        ),
    )
    fp = F.when(F.size("w") >= WINDOW_W, F.array_min(grams)).otherwise(F.md5("t"))
    n_windows = F.when(
        F.size("w") >= WINDOW_W, F.size("w") - (WINDOW_W - 1)
    ).otherwise(F.lit(0))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), n_windows.cast("int").alias("n_windows")
    )


TEXT_FINGERPRINT_SQL = f"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(trim(text), '\\s+', ' ', 'g') AS t,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(w) >= {WINDOW_W}
            THEN list_min(list_transform(range(1, len(w) - {WINDOW_W - 1} + 1),
                   i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])))
            ELSE md5(t) END AS fingerprint,
       CAST(CASE WHEN len(w) >= {WINDOW_W} THEN len(w) - {WINDOW_W - 1} ELSE 0 END AS INT) AS n_windows
FROM d
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics: duplicate-word fraction and the
    most-frequent-bigram fraction per document.

    The duplicate-word fraction is a narrow projection. The top-bigram mode
    is computed RELATIONALLY — explode bigrams, count per (doc, gram), max
    per doc — because a per-row O(grams^2) array-mode would blow up on long
    documents; both aggregations have map-side combine and key cardinality
    bounded by distinct (doc, gram), so the shape survives arbitrarily long
    docs at 100 TB.
    """
    return repetition_df(_docs(spark, sf_dir))


def repetition_df(docs_in: DataFrame) -> DataFrame:
    docs = docs_in.select("doc_id", _words().alias("w"))
    base = docs.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
    )
    grams = (
        docs.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("w", i), F.element_at("w", i + 1)
                    ),
                )
            ).alias("gram"),
        )
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams"))
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        (
            (F.col("n_words") - F.col("n_distinct")).cast("double")
            / F.col("n_words").cast("double")
        ).alias("dup_word_frac"),
        F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("bigint").alias("top_bigram_count"),
        F.when(
            F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


TEXT_REPETITION_SQL = """
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
base AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct FROM d
),
grams AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
  FROM d WHERE len(w) >= 2
),
gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
top AS (
  SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams FROM gc GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.n_words AS INT) AS n_words,
       CAST(b.n_words - b.n_distinct AS DOUBLE) / CAST(b.n_words AS DOUBLE) AS dup_word_frac,
       CAST(COALESCE(t.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       CASE WHEN COALESCE(t.n_bigrams, 0) > 0
            THEN CAST(t.top_bigram_count AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS top_bigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
"""


BENCH_DOC_CUTOFF = 10  # doc_id < 10 acts as the synthetic "benchmark" set


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, the
    fraction of its distinct word-3-grams that appear in ANY benchmark
    document (here: doc_id < BENCH_DOC_CUTOFF stands in for the held-out
    eval set).

    Plan shape: the benchmark gram set is tiny relative to the corpus by
    definition — distinct + broadcast; the corpus side explodes grams and
    LEFT SEMI joins against it (never materializes non-matches), then a
    combiner-friendly per-doc count. At 100 TB the corpus never shuffles on
    anything wider than (doc_id).
    """
    return contamination_df(_docs(spark, sf_dir))


def contamination_df(docs: DataFrame) -> DataFrame:
    from .dedup import _shingled

    sh = _shingled(docs)
    totals = sh.filter(F.col("doc_id") >= BENCH_DOC_CUTOFF).select(
        "doc_id", F.size("shingles").alias("n_grams")
    )
    corpus = sh.filter(F.col("doc_id") >= BENCH_DOC_CUTOFF).select(
        "doc_id", F.explode("shingles").alias("gram")
    )
    bench = (
        sh.filter(F.col("doc_id") < BENCH_DOC_CUTOFF)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    matched = (
        corpus.join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return totals.join(matched, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("int").alias("n_grams"),
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        (
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
            / F.col("n_grams").cast("double")
        ).alias("contamination_frac"),
    )


TEXT_CONTAMINATION_SQL = f"""
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM d WHERE len(w) >= 3
),
bench AS (
  SELECT DISTINCT UNNEST(s) AS gram FROM sh WHERE doc_id < {BENCH_DOC_CUTOFF}
),
corpus AS (
  SELECT doc_id, UNNEST(s) AS gram FROM sh WHERE doc_id >= {BENCH_DOC_CUTOFF}
),
tot AS (
  SELECT doc_id, len(s) AS n_grams FROM sh WHERE doc_id >= {BENCH_DOC_CUTOFF}
),
m AS (
  SELECT c.doc_id, COUNT(*) AS n_cont
  FROM corpus c JOIN bench b USING (gram) GROUP BY 1
)
SELECT t.doc_id,
       CAST(t.n_grams AS INT) AS n_grams,
       CAST(COALESCE(m.n_cont, 0) AS BIGINT) AS n_contaminated,
       CAST(COALESCE(m.n_cont, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) AS contamination_frac
FROM tot t LEFT JOIN m USING (doc_id)
"""


# Simple, RE2-and-Java-compatible patterns (no backrefs / lookarounds).
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
LONG_NUM_RE = "[0-9]{7,}"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count + redact email addresses and long digit
    runs (phone/ID-shaped). Pure narrow projection — regexp_count and two
    regexp_replace passes per row, no shuffle; the scrubbed text is
    returned as an md5 so the differential check pins the exact redaction
    output without hauling full text through the compare.
    """
    return pii_scrub_df(_docs(spark, sf_dir))


def pii_scrub_df(docs: DataFrame) -> DataFrame:
    t = _norm_text()
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), LONG_NUM_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(LONG_NUM_RE)).cast("bigint").alias("n_long_numbers"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


TEXT_PII_SCRUB_SQL = (
    "SELECT doc_id,\n"
    "       CAST(len(regexp_extract_all(t, '" + EMAIL_RE + "')) AS BIGINT) AS n_emails,\n"
    "       CAST(len(regexp_extract_all(t, '" + LONG_NUM_RE + "')) AS BIGINT) AS n_long_numbers,\n"
    "       md5(regexp_replace(regexp_replace(t, '" + EMAIL_RE + "', '<EMAIL>', 'g'),\n"
    "                          '" + LONG_NUM_RE + "', '<NUM>', 'g')) AS scrubbed_md5\n"
    "FROM (SELECT doc_id, regexp_replace(trim(text), '\\s+', ' ', 'g') AS t FROM documents)\n"
)


def unigram_logprob_df(docs: DataFrame, vocab_size: int = 50_000) -> DataFrame:
    """Unigram language-model quality score (the CCNet-style perplexity
    proxy): per document, the mean negative log2 unigram probability of its
    tokens under the corpus's OWN empirical unigram distribution. Low
    bits-per-token = typical text; high = noise, OOV soup, or junk — the
    standard cheap LM filter when a real LM is too expensive at corpus
    scale.

    Engine-exact construction: token probabilities use integer counts
    (count(w)/total); each token's -log2(p) is rounded independently to
    integer micro-bits and summed as BIGINT (order-independent — same trick
    as the PageRank/Adamic-Adar oracles); the per-doc mean is an integer
    floor-division. Vocabulary = the ``vocab_size`` most frequent tokens
    (ties broken by token text, deterministic); everything else scores at
    the floor probability 1/total (add-nothing smoothing, documented).

    Scale: one corpus-wide token-count aggregate (map-side combined; the
    hot-key "the" is absorbed by partial aggregation), a driver-free top-K
    vocabulary (TakeOrdered over the vocab-sized count table — never the
    corpus), and ONE broadcast join of the bounded vocab onto the exploded
    tokens. Stopword skew never shuffles: the probability lookup is
    broadcast, so the only corpus Exchange is the per-doc score aggregate
    keyed on doc_id (uniform).

    Returns (doc_id, n_tokens, bits_micro_per_token).
    """
    toks = docs.select("doc_id", F.explode(_words()).alias("w"))
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = toks.count()
    vocab = counts.orderBy(F.col("c").desc(), F.col("w")).limit(vocab_size)
    # -log2(c/total) in micro-bits, precomputed per vocab row (tiny table)
    bits = F.round(
        F.lit(1_000_000.0) * -F.log2(F.col("c").cast("double") / F.lit(float(total)))
    ).cast("bigint")
    vocab_bits = vocab.select("w", bits.alias("bits_micro"))
    floor_bits = int(round(1_000_000.0 * __import__("math").log2(float(total))))
    scored = toks.join(F.broadcast(vocab_bits), "w", "left").select(
        "doc_id", F.coalesce("bits_micro", F.lit(floor_bits)).alias("bits_micro")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.expr("sum(bits_micro) div count(*)").cast("bigint").alias(
                "bits_micro_per_token"
            ),
        )
    )


TEXT_QUERIES: dict[str, tuple] = {
    "text_language_id": (text_language_id, TEXT_LANGUAGE_ID_SQL),
    "text_quality_score": (text_quality_score, TEXT_QUALITY_SCORE_SQL),
    "text_token_count": (text_token_count, TEXT_TOKEN_COUNT_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "text_repetition": (text_repetition, TEXT_REPETITION_SQL),
    "text_contamination": (text_contamination, TEXT_CONTAMINATION_SQL),
    "text_pii_scrub": (text_pii_scrub, TEXT_PII_SCRUB_SQL),
}


def token_cooccurrence_pmi(
    docs: DataFrame,
    top_tokens_per_doc: int = 32,
    min_pair_docs: int = 2,
) -> DataFrame:
    """Pointwise-mutual-information token co-occurrence graph over a
    document corpus — the classic word-association structure (collocation
    mining, retrieval expansion, embedding evaluation) built from
    document-level co-occurrence.

    PMI(a, b) = log( P(a,b) / (P(a) P(b)) ) with probabilities = document
    frequencies over the corpus. Scale discipline: the pair space is NEVER
    the full vocab² — each document contributes pairs only among its own
    top ``top_tokens_per_doc`` tokens (by in-doc frequency, ties by token
    — deterministic), so per-doc fan-out is bounded by N(N-1)/2 and the
    pair join is keyed on doc_id. Marginal document frequencies join back
    onto the surviving pairs (≥ ``min_pair_docs`` docs) by token key. All
    JVM expression code; one explode, two keyed shuffles, no Python.

    Returns (token_a, token_b, n_docs_pair, n_docs_a, n_docs_b,
    pmi double) with token_a < token_b.
    """
    from pyspark.sql import Window

    words = F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"[^a-z0-9]+", " "), " ")
    tok = (
        docs.select("doc_id", F.explode(words).alias("token"))
        .where(F.col("token") != "")
    )
    in_doc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # ``top`` feeds THREE consumers (both sides of the pair self-join plus
    # the df marginal); persisted so the explode + tf aggregate + window run
    # once, not three times. Bounded at top_tokens_per_doc rows per doc.
    from pyspark.storagelevel import StorageLevel

    top = (
        in_doc.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("tf").desc(), F.col("token")
                )
            ),
        )
        .where(F.col("rk") <= top_tokens_per_doc)
        .select("doc_id", "token")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("d")).first()["d"]
    df_tok = top.groupBy("token").agg(F.count("*").alias("df"))
    a, b = top.alias("a"), top.alias("b")
    pairs = (
        a.join(b, on="doc_id")
        .where(F.col("a.token") < F.col("b.token"))
        .groupBy(
            F.col("a.token").alias("token_a"), F.col("b.token").alias("token_b")
        )
        .agg(F.count("*").alias("n_docs_pair"))
        .where(F.col("n_docs_pair") >= min_pair_docs)
    )
    return (
        pairs.join(df_tok.select(F.col("token").alias("token_a"), F.col("df").alias("n_docs_a")), "token_a")
        .join(df_tok.select(F.col("token").alias("token_b"), F.col("df").alias("n_docs_b")), "token_b")
        .select(
            "token_a",
            "token_b",
            F.col("n_docs_pair").cast("bigint").alias("n_docs_pair"),
            F.col("n_docs_a").cast("bigint").alias("n_docs_a"),
            F.col("n_docs_b").cast("bigint").alias("n_docs_b"),
            F.log(
                (F.col("n_docs_pair").cast("double") * F.lit(float(n_docs)))
                / (F.col("n_docs_a") * F.col("n_docs_b"))
            ).alias("pmi"),
        )
    )


def tfidf_df(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """TF-IDF term weights per document — the classic sparse retrieval /
    relevance weighting (Salton), long-row layout:
    (doc_id, token, tf, df, tfidf) with
    tfidf = tf · ln((1 + D) / (1 + df)) (smoothed idf, never division by
    zero, engine-portable arithmetic). ``min_df`` drops hapax noise.

    Shapes: one explode + two keyed partial-aggregated counts (per-doc tf,
    corpus df) + a token-keyed join of the df marginal back onto the tf
    rows — the same inverted-index discipline as the dedup family; the
    vocabulary is never collected anywhere. The tf table is persisted
    (MEMORY_AND_DISK): both the df marginal and the final join consume it,
    and without the persist Catalyst re-scans and re-explodes the whole
    corpus for each branch — a 2x scan at 100 TB. tf is inverted-index
    sized (sum of per-doc distinct tokens), far smaller than the raw text,
    and spills. The df marginal stays a partial-aggregated groupBy (NOT a
    window over token — a token-partitioned window would funnel every
    occurrence of a stopword into one task; map-side combine crushes hot
    tokens before the exchange).
    """
    from pyspark.storagelevel import StorageLevel

    words = F.split(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"[^a-z0-9]+", " "), " "
    )
    tok = docs.select("doc_id", F.explode(words).alias("token")).where(
        F.col("token") != ""
    )
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_docs = docs.select(F.countDistinct("doc_id")).first()[0]
    df_tok = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )
    return (
        tf.join(df_tok, "token")
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            (
                F.col("tf")
                * F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
            ).alias("tfidf"),
        )
    )


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weights over documents (:func:`tfidf_df`, min_df=2), with the
    double weight emitted as a micro-rounded BIGINT: ln() is not guaranteed
    correctly-rounded across libm implementations, so the raw double can
    differ in the last ulp between engines — the integer-micro compare is
    the same device the PageRank oracle uses."""
    out = tfidf_df(_docs(spark, sf_dir), min_df=2)
    return out.select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.round(F.col("tfidf") * 1e6).cast("bigint").alias("tfidf_micro"),
    )


TEXT_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(trim(lower(text)), '[^a-z0-9]+', ' ', 'g'),
                             ' ')) AS token
  FROM documents
),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok2 GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) >= 2),
d AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT t.doc_id, t.token,
       CAST(t.tf AS BIGINT) AS tf,
       CAST(f.df AS BIGINT) AS df,
       CAST(round(1e6 * t.tf * ln((1.0 + d.n) / (1.0 + f.df))) AS BIGINT)
         AS tfidf_micro
FROM tf t JOIN dfq f USING (token) CROSS JOIN d
"""


def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI token co-occurrence graph (:func:`token_cooccurrence_pmi`,
    top 32 tokens/doc, pairs in >= 2 docs); pmi micro-rounded for the same
    libm-ln reason as :func:`text_tfidf`."""
    out = token_cooccurrence_pmi(_docs(spark, sf_dir))
    return out.select(
        "token_a",
        "token_b",
        "n_docs_pair",
        "n_docs_a",
        "n_docs_b",
        F.round(F.col("pmi") * 1e6).cast("bigint").alias("pmi_micro"),
    )


TEXT_PMI_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(trim(lower(text)), '[^a-z0-9]+', ' ', 'g'),
                             ' ')) AS token
  FROM documents
),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
indoc AS (SELECT doc_id, token, count(*) AS tf FROM tok2 GROUP BY 1, 2),
top AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, token,
           row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, token) AS rk
    FROM indoc)
  WHERE rk <= 32
),
dft AS (SELECT token, count(*) AS df FROM top GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS d FROM documents),
pairs AS (
  SELECT a.token AS token_a, b.token AS token_b, count(*) AS n_docs_pair
  FROM top a JOIN top b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.token_a, p.token_b,
       CAST(p.n_docs_pair AS BIGINT) AS n_docs_pair,
       CAST(da.df AS BIGINT) AS n_docs_a,
       CAST(db.df AS BIGINT) AS n_docs_b,
       CAST(round(1e6 * ln((p.n_docs_pair * CAST(nd.d AS DOUBLE))
                           / (da.df * db.df))) AS BIGINT) AS pmi_micro
FROM pairs p
JOIN dft da ON da.token = p.token_a
JOIN dft db ON db.token = p.token_b
CROSS JOIN nd
"""


TEXT_QUERIES.update(
    {
        "text_tfidf": (text_tfidf, TEXT_TFIDF_SQL),
        "text_pmi": (text_pmi, TEXT_PMI_SQL),
    }
)


UNIGRAM_VOCAB_SIZE = 2000  # < corpus distinct tokens, so the OOV floor is real


def text_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (:func:`unigram_logprob_df`) with a vocab
    small enough that the OOV floor path carries real rows at every
    shipped sf — a driver row that never exercises OOV would certify only
    half the operator."""
    return unigram_logprob_df(_docs(spark, sf_dir), vocab_size=UNIGRAM_VOCAB_SIZE)


TEXT_UNIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents
),
counts AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT COUNT(*) AS t FROM toks),
vocab AS (SELECT w, c FROM counts ORDER BY c DESC, w LIMIT {UNIGRAM_VOCAB_SIZE}),
vb AS (
  SELECT v.w,
         CAST(round(1000000.0 * -log2(CAST(v.c AS DOUBLE) / t.t)) AS BIGINT) AS bits
  FROM vocab v CROSS JOIN tot t
),
fb AS (
  SELECT CAST(round(1000000.0 * log2(CAST(t AS DOUBLE))) AS BIGINT) AS fbits
  FROM tot
),
scored AS (
  SELECT tk.doc_id, COALESCE(vb.bits, fb.fbits) AS bits
  FROM toks tk LEFT JOIN vb ON vb.w = tk.w CROSS JOIN fb
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
       CAST(SUM(bits) // COUNT(*) AS BIGINT) AS bits_micro_per_token
FROM scored GROUP BY 1
"""


TEXT_QUERIES.update(
    {
        # staged round-7 rotation stock (see registry.STAGED_NEXT_ROTATION)
        "text_unigram_lm": (text_unigram_lm, TEXT_UNIGRAM_LM_SQL),
    }
)


# --- Gopher-style composite quality gate ---------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "a", "in", "that", "have", "with")
GOPHER_WORD_MIN = 50
GOPHER_WORD_MAX = 100_000
GOPHER_MWL_MIN_MICRO = 3_000_000  # mean word length in [3, 10] chars
GOPHER_MWL_MAX_MICRO = 10_000_000
GOPHER_STOP_MIN = 2  # >= 2 distinct required stopwords present
GOPHER_TOPFRAC_MAX_MICRO = 200_000  # most frequent word <= 20% of tokens


def gopher_rules_df(docs: DataFrame) -> DataFrame:
    """Composite pretraining quality gate in the Gopher/MassiveText style
    (Rae et al. 2021 §A1.1): per-document structural measures, one boolean
    per rule, and the AND-of-rules ``keep`` decision — the standard cheap
    filter battery run before any model-based scoring.

    Rules (thresholds above, all engine-exact integers):
    word count within bounds; mean word length within [3, 10] (micro-unit
    integer division); at least ``GOPHER_STOP_MIN`` distinct required
    stopwords present (the "not keyword soup" test); most-frequent-word
    fraction bounded (the cheap repetition test — full n-gram repetition
    lives in :func:`repetition_df`).

    Scale: the per-doc measures are narrow JVM higher-order functions over
    the split array (no explode, no shuffle); only the top-word fraction
    pays one explode + two doc_id-keyed partial aggregates (uniform key).
    Every measure is integer or integer-micro division, so the driver hash
    certifies bit-for-bit.

    Returns (doc_id, n_words, mean_word_len_micro, n_stop_distinct,
    top_word_frac_micro, flag_* booleans, keep).
    """
    ws = F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
    base = docs.select(
        "doc_id",
        ws.alias("ws"),
        F.size(ws).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_chars"),
        F.size(
            F.array_intersect(ws, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
        )
        .cast("bigint")
        .alias("n_stop_distinct"),
    )
    top = (
        docs.select("doc_id", F.explode(ws).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    out = base.join(top, "doc_id").select(
        "doc_id",
        "n_words",
        F.expr("(1000000 * sum_chars) div n_words").alias("mean_word_len_micro"),
        "n_stop_distinct",
        F.expr("(1000000 * top_c) div n_words").alias("top_word_frac_micro"),
    )
    flags = out.select(
        "*",
        F.col("n_words").between(GOPHER_WORD_MIN, GOPHER_WORD_MAX).alias(
            "flag_word_count"
        ),
        F.col("mean_word_len_micro")
        .between(GOPHER_MWL_MIN_MICRO, GOPHER_MWL_MAX_MICRO)
        .alias("flag_mean_len"),
        (F.col("n_stop_distinct") >= GOPHER_STOP_MIN).alias("flag_stopwords"),
        (F.col("top_word_frac_micro") <= GOPHER_TOPFRAC_MAX_MICRO).alias(
            "flag_repetition"
        ),
    )
    return flags.withColumn(
        "keep",
        F.col("flag_word_count")
        & F.col("flag_mean_len")
        & F.col("flag_stopwords")
        & F.col("flag_repetition"),
    )


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule gate over the documents corpus (:func:`gopher_rules_df`);
    thresholds chosen so every rule and the composite keep vary at the
    driver's gate sf (word-count fails ~45% of docs, stopword rule ~37%,
    repetition has real spread) — a constant-column certification would be
    vacuous."""
    return gopher_rules_df(_docs(spark, sf_dir))


_GOPHER_STOP_SQL = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)

TEXT_GOPHER_RULES_SQL = f"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS ws
  FROM documents
),
base AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST((SELECT SUM(len(w)) FROM unnest(ws) u(w)) AS BIGINT) AS sum_chars,
         CAST((SELECT COUNT(DISTINCT w) FROM unnest(ws) u(w)
               WHERE w IN ({_GOPHER_STOP_SQL})) AS BIGINT) AS n_stop_distinct,
         CAST((SELECT MAX(c) FROM (
                SELECT COUNT(*) AS c FROM unnest(ws) u(w) GROUP BY w)) AS BIGINT)
           AS top_c
  FROM t
),
m AS (
  SELECT doc_id, n_words,
         (1000000 * sum_chars) // n_words AS mean_word_len_micro,
         n_stop_distinct,
         (1000000 * top_c) // n_words AS top_word_frac_micro
  FROM base
)
SELECT doc_id, n_words, mean_word_len_micro, n_stop_distinct, top_word_frac_micro,
       n_words BETWEEN {GOPHER_WORD_MIN} AND {GOPHER_WORD_MAX} AS flag_word_count,
       mean_word_len_micro BETWEEN {GOPHER_MWL_MIN_MICRO} AND {GOPHER_MWL_MAX_MICRO}
         AS flag_mean_len,
       n_stop_distinct >= {GOPHER_STOP_MIN} AS flag_stopwords,
       top_word_frac_micro <= {GOPHER_TOPFRAC_MAX_MICRO} AS flag_repetition,
       (n_words BETWEEN {GOPHER_WORD_MIN} AND {GOPHER_WORD_MAX})
         AND (mean_word_len_micro BETWEEN {GOPHER_MWL_MIN_MICRO} AND {GOPHER_MWL_MAX_MICRO})
         AND (n_stop_distinct >= {GOPHER_STOP_MIN})
         AND (top_word_frac_micro <= {GOPHER_TOPFRAC_MAX_MICRO}) AS keep
FROM m
"""


# --- Interpolated bigram language model ----------------------------------

BIGRAM_LAMBDA = 0.75  # weight on the bigram term; (1 - λ) on the unigram


def bigram_logprob_df(docs: DataFrame, lam: float = BIGRAM_LAMBDA) -> DataFrame:
    """Interpolated bigram language-model score: per document, the mean
    -log2 of p(w_i) under p = λ·p_bg(w_i | w_{i-1}) + (1-λ)·p_ug(w_i),
    with both distributions estimated from the corpus itself — one rung up
    the KenLM ladder from :func:`unigram_logprob_df` (context-aware, so
    shuffled-word-soup documents score measurably worse than ordered prose
    even when their unigram profiles are identical). Document-initial
    tokens score with the unigram term alone (no cross-document context).

    Engine-exact: probabilities are ratios of BIGINT counts; each token's
    -log2(p) micro-rounds independently and sums as BIGINT (order-free),
    mean by integer division — the tfidf/unigram device.

    Scale: token pairs come from one lag window partitioned by doc_id
    (arbitrarily long docs stream through the window sort); unigram,
    bigram, and context counts are three partial aggregates; scoring is
    keyed equi-joins (token key, (prev, token) key) — nothing is ever
    collected to the driver and no join can degrade to a product
    (plan-pinned). At toy SFs Catalyst broadcasts the small count tables
    (correct adaptive behavior); at corpus scale their stats exceed any
    broadcast threshold and the same plan runs as shuffled keyed joins.

    Returns (doc_id, n_tokens, bits_micro_per_token).
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
        ).alias("pos", "w"),
    )
    seq = toks.withColumn(
        "prev", F.lag("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    )
    uni = seq.groupBy("w").agg(F.count("*").alias("cu"))
    total = seq.count()
    bi = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count("*").alias("cb"))
    )
    ctx = bi.groupBy("prev").agg(F.sum("cb").alias("cc"))
    p_ug = F.col("cu").cast("double") / F.lit(float(total))
    scored = (
        seq.join(uni, "w")
        .join(bi, ["prev", "w"], "left")
        .join(ctx, "prev", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(1_000_000.0)
                * -F.log2(
                    F.when(F.col("prev").isNull(), p_ug).otherwise(
                        F.lit(lam)
                        * F.col("cb").cast("double")
                        / F.col("cc").cast("double")
                        + F.lit(1.0 - lam) * p_ug
                    )
                )
            )
            .cast("bigint")
            .alias("bits_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.expr("sum(bits_micro) div count(*)").cast("bigint").alias(
            "bits_micro_per_token"
        ),
    )


def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM score (:func:`bigram_logprob_df`) over the
    documents corpus."""
    return bigram_logprob_df(_docs(spark, sf_dir))


TEXT_BIGRAM_LM_SQL = f"""
WITH lists AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS ws
  FROM documents
),
toks AS (
  -- parallel UNNESTs zip positionally in DuckDB: (w, pos) pairs
  SELECT doc_id, UNNEST(ws) AS w, UNNEST(range(1, len(ws) + 1)) AS pos
  FROM lists
),
seq AS (
  SELECT doc_id, w,
         LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
),
uni AS (SELECT w, COUNT(*) AS cu FROM seq GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM seq),
bi AS (
  SELECT prev, w, COUNT(*) AS cb FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
ctx AS (SELECT prev, SUM(cb) AS cc FROM bi GROUP BY 1),
scored AS (
  SELECT s.doc_id,
         CAST(round(1000000.0 * -log2(
           CASE WHEN s.prev IS NULL THEN u.cu / tot.t
                ELSE {BIGRAM_LAMBDA!r} * (CAST(b.cb AS DOUBLE) / c.cc)
                     + {1.0 - BIGRAM_LAMBDA!r} * (u.cu / tot.t)
           END)) AS BIGINT) AS bits_micro
  FROM seq s
  JOIN uni u ON u.w = s.w
  LEFT JOIN bi b ON b.prev = s.prev AND b.w = s.w
  LEFT JOIN ctx c ON c.prev = s.prev
  CROSS JOIN tot
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
       CAST(SUM(bits_micro) // COUNT(*) AS BIGINT) AS bits_micro_per_token
FROM scored GROUP BY 1
"""


TEXT_QUERIES.update(
    {
        # staged round-8 rotation stock (declared r07,
        # registry.STAGED_DECLARED_ROUND)
        "text_gopher_rules": (text_gopher_rules, TEXT_GOPHER_RULES_SQL),
        "text_bigram_lm": (text_bigram_lm, TEXT_BIGRAM_LM_SQL),
    }
)


def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-novelty score per document: the fraction of the doc's
    distinct word-3-grams that occur in NO other document — a
    data-quality/duplication signal between exact dedup (novelty 0 for
    byte-dups) and near-dup pairs (boilerplate-heavy docs score low while
    never pairing above the Jaccard threshold). Ratio is an exact integer
    division of two counts, so the doubles compare bit-for-bit.

    Plan: one shingle explode -> corpus-wide document-frequency hash
    aggregate (map-side combine, grouped on the shingle STRING so the
    oracle shares semantics without hashing caveats) -> per-doc count of
    df==1 shingles. Two shuffles, both on near-uniform keys; no pairs
    anywhere. Shingling reuses dedup._shingled (Scala NGram sliding
    window) — a hand-rolled F.transform gram builder re-measured the
    pathologies that function's docstring records (interpreted per-gram
    HOF ~17 s at sf0.1 vs ~2 s).
    """
    from .dedup import _shingled

    sh = _shingled(_docs(spark, sf_dir)).select(
        "doc_id", F.col("shingles").alias("s")
    )
    posting = sh.select("doc_id", F.explode("s").alias("g"))
    df_counts = posting.groupBy("g").agg(F.count("*").alias("df"))
    uniq = (
        posting.join(df_counts, "g")
        .where(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_unique"))
    )
    return (
        sh.select("doc_id", F.size("s").alias("n_sh"))
        .where(F.col("n_sh") > 0)
        .join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_sh",
            F.coalesce("n_unique", F.lit(0)).cast("bigint").alias("n_unique"),
            (
                F.coalesce("n_unique", F.lit(0)).cast("double")
                / F.col("n_sh").cast("double")
            ).alias("novelty"),
        )
    )


TEXT_NOVELTY_SQL = """
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS s
  FROM docs
),
posting AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
dfc AS (SELECT g, COUNT(*) AS df FROM posting GROUP BY g),
uniq AS (
  SELECT p.doc_id, COUNT(*) AS n_unique
  FROM posting p JOIN dfc ON dfc.g = p.g
  WHERE dfc.df = 1 GROUP BY p.doc_id
)
SELECT sh.doc_id, CAST(len(sh.s) AS INT) AS n_sh,
       CAST(COALESCE(u.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(COALESCE(u.n_unique, 0) AS DOUBLE) / len(sh.s) AS novelty
FROM sh LEFT JOIN uniq u USING (doc_id)
WHERE len(sh.s) > 0
"""


TEXT_QUERIES.update(
    {
        # staged r10: corpus-novelty quality signal
        "text_novelty": (text_novelty, TEXT_NOVELTY_SQL),
    }
)


HASH_DIM = 16  # feature-hashing buckets


def hashed_features_df(docs: DataFrame, dim: int = HASH_DIM) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009): featurize text
    into a fixed ``dim``-bucket sparse count vector without any vocabulary
    — bucket = md5int(token) mod dim, signed by one extra hash bit so
    collisions cancel in expectation. The vocabulary-free property is the
    100 TB point: a dictionary-based vectorizer needs a fitted vocab
    broadcast (and a corpus pass to build it); the hashing featurizer is
    one stateless narrow pass, embarrassingly parallel, identical on any
    corpus split. Emits sparse rows (doc_id, bucket, signed_count) —
    map-side combined per doc, never a dense dim-wide array through the
    shuffle. md5 (not xxhash64) so DuckDB replays the bucketing exactly."""
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    h = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    return (
        tok.select(
            "doc_id",
            F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
            F.when(F.pmod(h, F.lit(2 * dim)) < dim, 1).otherwise(-1).alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("bigint").alias("signed_count"))
    )


def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: 16-bucket signed hashing-trick features per doc."""
    return hashed_features_df(_docs(spark, sf_dir))


TEXT_HASHED_FEATURES_SQL = f"""
WITH tok AS (
  SELECT doc_id, lower(t) AS t
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS u(t)
  WHERE t <> ''
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {HASH_DIM} AS bucket,
         CASE WHEN CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                   % {2 * HASH_DIM} < {HASH_DIM}
              THEN 1 ELSE -1 END AS sign
  FROM tok
)
SELECT doc_id, CAST(bucket AS INT) AS bucket,
       CAST(SUM(sign) AS BIGINT) AS signed_count
FROM hashed GROUP BY doc_id, bucket
"""


TEXT_QUERIES.update(
    {
        # staged r11: vocabulary-free hashing-trick featurizer
        "text_hashed_features": (text_hashed_features, TEXT_HASHED_FEATURES_SQL),
    }
)


# --- BPE subword tokenizer (functions/bpe.py) ------------------------------


def bpe_encode_df(docs: DataFrame) -> DataFrame:
    """Deterministic BPE subword encoding of a ``(doc_id, text)`` frame —
    the real tokenizer behind packing / budget admission, replacing the
    regex count's approximation (see :mod:`..functions.bpe` for the
    algorithm and the 1,024-merge checked-in table learned by
    ``tools/learn_bpe.py``).

    Arrow kernel (mapInPandas): normalization is vectorized pandas string
    ops; the merge loop is WORD-LOCAL with a process-wide per-word cache
    (``functions.bpe.bpe_encode_word``) — per batch O(#words) dict lookups
    plus a one-time O(wordlen^2) encode per new vocabulary word,
    independent of merge-table size per document (the r12 replace-chain
    kernel was O(len * n_merges), untenable at a realistic vocab). No
    shuffle; null text encodes to the empty token list. Emits
    ``(doc_id, n_bpe, enc_md5, head_tokens)``: the token count, the md5 of
    the full encoded symbol string (pins the exact byte output without
    hauling the token stream through the gate), and the first 8 tokens."""
    from ..functions.bpe import SEP, bpe_encode_word, bpe_normalize_series

    docs = docs.select("doc_id", "text")

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            norm = bpe_normalize_series(pdf["text"])
            toks = norm.map(
                lambda nm: [t for w in nm.split(" ") for t in bpe_encode_word(w)]
                if nm
                else []
            )
            s = toks.map(lambda ts: SEP + SEP.join(ts) if ts else "")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe": toks.map(len).astype("int64"),
                    "enc_md5": s.map(
                        lambda x: hashlib.md5(x.encode()).hexdigest() if x else ""
                    ),
                    "head_tokens": toks.map(lambda ts: " ".join(ts[:8])),
                }
            )

    return docs.mapInPandas(
        kernel, "doc_id long, n_bpe long, enc_md5 string, head_tokens string"
    )


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: :func:`bpe_encode_df` over the documents table. The
    oracle is GENERATED from the same merge table
    (:func:`..functions.bpe.bpe_enc_ctes`) — the oracle reconstructs every
    document's full symbol string from a golden word -> symbols table
    produced by the same executable spec, so the md5 match certifies every
    merge step, not just counts."""
    return bpe_encode_df(_docs(spark, sf_dir))


def _bpe_sql() -> str:
    from ..functions.bpe import SEP, bpe_enc_ctes

    return f"""
WITH {bpe_enc_ctes()}
SELECT doc_id,
       CAST(CASE WHEN norm = '' THEN 0
            ELSE length(s) - length(replace(s, '{SEP}', '')) END AS BIGINT)
         AS n_bpe,
       CASE WHEN norm = '' THEN '' ELSE md5(s) END AS enc_md5,
       CASE WHEN norm = '' THEN ''
            ELSE array_to_string(list_slice(string_split(s, '{SEP}'), 2, 9), ' ')
       END AS head_tokens
FROM enc
"""


TEXT_BPE_ENCODE_SQL = _bpe_sql()


TEXT_QUERIES.update(
    {
        # r12: deterministic BPE subword tokenizer (Arrow replace-chain
        # kernel; oracle generated from the same checked-in merge table)
        "text_bpe_encode": (text_bpe_encode, TEXT_BPE_ENCODE_SQL),
    }
)


def bpe_tokens_df(docs: DataFrame) -> DataFrame:
    """Exploded BPE token stream ``(doc_id, tok)`` — the 1 -> n_tokens
    explode happens INSIDE the Arrow kernel (the mm_image_patches shape),
    so the plan stays a single shuffle-free MapInPandas however long the
    documents are."""
    from ..functions.bpe import bpe_encode_word, bpe_normalize_series

    docs = docs.select("doc_id", "text")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            norm = bpe_normalize_series(pdf["text"])
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tok": norm.map(
                        lambda nm: [
                            t for w in nm.split(" ") for t in bpe_encode_word(w)
                        ]
                        if nm
                        else []
                    ),
                }
            ).explode("tok")
            yield out[out["tok"].notna()]

    return docs.mapInPandas(kernel, "doc_id long, tok string")


def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's vocabulary report: per BPE token, corpus occurrence
    count and document frequency — what a tokenizer-coverage audit reads
    (which merges earn their slot, what the OOV tail looks like) and the
    frequency table a unigram-LM-over-subwords would consume. One
    map-side-combined aggregate over the kernel's exploded token stream;
    the shuffle carries <= |vocab| rows per task, constant in corpus
    size. The oracle unnests the golden-table reconstruction's split — same
    table, same split, so token identity certifies exactly."""
    toks = bpe_tokens_df(_docs(spark, sf_dir))
    return toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("n_occ"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )


def _bpe_vocab_sql() -> str:
    from ..functions.bpe import SEP, bpe_enc_ctes

    return f"""
WITH {bpe_enc_ctes()},
toks AS (
  SELECT doc_id, t AS tok
  FROM enc, UNNEST(list_slice(string_split(s, '{SEP}'), 2,
                              length(s) + 1)) AS u(t)
  WHERE norm <> ''
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM toks GROUP BY tok
"""


TEXT_BPE_VOCAB_SQL = _bpe_vocab_sql()


TEXT_QUERIES.update(
    {
        # r12 (staged r13): BPE vocabulary report (occurrence + doc freq)
        "text_bpe_vocab": (text_bpe_vocab, TEXT_BPE_VOCAB_SQL),
    }
)


def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer compression audit per language: document/word/token
    counts plus the two ratios a vocabulary decision actually reads —
    normalized chars per BPE token and BPE tokens per word — in exact
    integer micro-units (``(sum_a * 1e6) div sum_b``), so the hash rides
    pure BIGINT arithmetic, never a float format edge.

    One Arrow kernel pass (same per-word cache as
    :func:`bpe_encode_df`) emitting three longs per doc, then a
    map-side-combined |langs|-row aggregate — shuffle carries ~5 rows.
    The oracle recomputes all three counts from the golden-table
    reconstruction (chars from ``norm``, words from its split, tokens
    from the symbol string), certifying the normalization, the split,
    and the merge output in one row per language."""
    from ..functions.bpe import bpe_encode_word, bpe_normalize_series

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            norm = bpe_normalize_series(pdf["text"])
            yield pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "n_chars": norm.str.len().astype("int64"),
                    "n_words": norm.map(
                        lambda nm: len(nm.split(" ")) if nm else 0
                    ).astype("int64"),
                    "n_bpe": norm.map(
                        lambda nm: sum(
                            len(bpe_encode_word(w)) for w in nm.split(" ")
                        )
                        if nm
                        else 0
                    ).astype("int64"),
                }
            )

    per = docs.mapInPandas(
        kernel, "lang string, n_chars long, n_words long, n_bpe long"
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_bpe").cast("bigint").alias("n_bpe"),
        F.expr("(sum(n_chars) * 1000000) div sum(n_bpe)")
        .cast("bigint")
        .alias("chars_per_token_micro"),
        F.expr("(sum(n_bpe) * 1000000) div sum(n_words)")
        .cast("bigint")
        .alias("tokens_per_word_micro"),
    )


def _bpe_compression_sql() -> str:
    from ..functions.bpe import SEP, bpe_enc_ctes

    tok = f"CASE WHEN norm = '' THEN 0 ELSE length(s) - length(replace(s, '{SEP}', '')) END"
    wrd = "CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END"
    return f"""
WITH {bpe_enc_ctes(cols="lang")}
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({wrd}) AS BIGINT) AS n_words,
       CAST(SUM({tok}) AS BIGINT) AS n_bpe,
       CAST((SUM(length(norm)) * 1000000) // SUM({tok}) AS BIGINT)
         AS chars_per_token_micro,
       CAST((SUM({tok}) * 1000000) // SUM({wrd}) AS BIGINT)
         AS tokens_per_word_micro
FROM enc GROUP BY lang
"""


TEXT_BPE_COMPRESSION_SQL = _bpe_compression_sql()


TEXT_QUERIES.update(
    {
        # r13 (staged r14): tokenizer compression audit (chars/token,
        # tokens/word per language in exact integer micro-units)
        "text_bpe_compression": (text_bpe_compression, TEXT_BPE_COMPRESSION_SQL),
    }
)


KEYWORDS_PER_DOC = 3


def keywords_df(docs: DataFrame, k: int = KEYWORDS_PER_DOC) -> DataFrame:
    """Top-k salient terms per document by TF-IDF — the keyword/tag
    extraction pass a corpus index or dataset card builds per doc. Ranks
    on the MICRO-ROUNDED integer weight (ties by token), not the raw
    double: ln() may differ in the last ulp across libm implementations,
    and an integer rank key inherits the same cross-engine stability the
    tfidf entry's micro compare relies on. Plan adds one doc_id-keyed
    window over the inverted-index-sized tfidf rows — partitioned on the
    near-uniform doc key, never on token."""
    from pyspark.sql.window import Window

    weighted = tfidf_df(docs, min_df=2).select(
        "doc_id",
        "token",
        F.round(F.col("tfidf") * 1e6).cast("bigint").alias("tfidf_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("token")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tfidf_micro")
    )


def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: top-3 TF-IDF keywords per document."""
    return keywords_df(_docs(spark, sf_dir))


TEXT_KEYWORDS_SQL = f"""
WITH tfidf AS ({TEXT_TFIDF_SQL}),
ranked AS (
  SELECT doc_id, token, tfidf_micro,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf_micro DESC, token ASC) AS INT)
           AS rank
  FROM tfidf
)
SELECT doc_id, rank, token, tfidf_micro
FROM ranked WHERE rank <= {KEYWORDS_PER_DOC}
"""


TEXT_QUERIES.update(
    {
        # r13 (staged r14): top-k TF-IDF keyword extraction per document
        "text_keywords": (text_keywords, TEXT_KEYWORDS_SQL),
    }
)
