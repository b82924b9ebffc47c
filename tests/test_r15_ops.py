"""Round-15 operator pins: record linkage (blocking + edit-distance
verify) against an independent pure-Python reference, and the planted
clean↔dirty recall contract of the registry entry."""

import itertools
from collections import Counter

from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.operators import linkage


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_linkage(records, q, max_df, max_dist):
    """Independent reference: same blocking contract, classic DP verify."""
    texts = dict(records)
    grams = {
        rid: {t[i: i + q] for i in range(len(t) - q + 1)}
        for rid, t in records
        if len(t) >= q
    }
    df = Counter(g for gs in grams.values() for g in gs)
    kept = {g for g, c in df.items() if c <= max_df}
    block = {}
    for rid, gs in grams.items():
        for g in gs & kept:
            block.setdefault(g, set()).add(rid)
    cand = {
        pair
        for ids in block.values()
        for pair in itertools.combinations(sorted(ids), 2)
    }
    return {
        (a, b, _py_levenshtein(texts[a], texts[b]))
        for a, b in cand
        if _py_levenshtein(texts[a], texts[b]) <= max_dist
    }


def test_record_linkage_matches_python_reference(spark):
    base = [
        "jonathan smith",
        "elizabeth archer",
        "margaret wilson",
        "christopher dean",
        "frederick jones",
        "alexandra stone",
    ]
    records = []
    for i, name in enumerate(base):
        records.append((i, name))
        # planted typo: drop one mid-string char
        records.append((100 + i, name[:5] + name[6:]))
        # planted substitution
        records.append((200 + i, name.replace(name[2], "x", 1)))
    # an unrelated singleton that must link to nothing
    records.append((999, "zzyzx quux"))
    expected = _py_linkage(records, q=4, max_df=10, max_dist=2)
    df = spark.createDataFrame(records, "rec_id long, text string")
    got = {
        (r.rec_a, r.rec_b, r.edit_dist)
        for r in linkage.record_linkage_df(df, q=4, max_df=10, max_dist=2).collect()
    }
    assert got == expected
    assert any(a == i and b == 100 + i for a, b, _ in got for i in range(6))
    assert not any(999 in (a, b) for a, b, _ in got)


def test_record_linkage_stop_gram_cap_guards_hub_blocks(spark):
    """Every record sharing one ubiquitous gram must NOT become one
    quadratic block: with the common prefix df-capped away, only the
    genuinely-close pair links."""
    records = [(i, f"common-prefix-{i:04d}") for i in range(50)]
    records.append((1000, "common-prefix-0001x"))  # distance 1 from rec 1
    texts = dict(records)
    df = spark.createDataFrame(records, "rec_id long, text string")
    out = linkage.record_linkage_df(df, q=4, max_df=10, max_dist=1).collect()
    got = {(r.rec_a, r.rec_b) for r in out}
    # rec 1 <-> its planted near-copy, found via the distinctive "0001" grams
    assert (1, 1000) in got
    # every emitted pair is a true distance-<=1 pair (verified exactly)
    for a, b in got:
        assert _py_levenshtein(texts[a], texts[b]) <= 1, (a, b)
    # the ubiquitous prefix gram (df = 51 > cap) did NOT create a
    # quadratic block: cross-decade distance-1 pairs share only capped
    # grams and are the documented blocking miss...
    assert (1, 41) not in got
    # ...and total volume stays far below the all-pairs C(51, 2) = 1275
    assert len(got) < 300, len(got)


def test_link_customer_dirty_planted_recall(spark, sf_dir):
    """Every clean↔dirty planted pair whose digit-tail grams survive the
    df cap must link at edit distance exactly 1; all output pairs are
    ordered and within threshold."""
    out = linkage.link_customer_dirty(spark, sf_dir).collect()
    assert out, "linkage produced no pairs"
    planted = {
        (r.rec_a, r.rec_b)
        for r in out
        if r.rec_b == r.rec_a + linkage.LINK_DIRTY_OFFSET
    }
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    # the all-zero-tail custkeys (e.g. 0, 100 at tiny sf) may legitimately
    # lose every distinctive gram to the cap; the overwhelming majority
    # must still be recalled
    assert len(planted) >= int(n_cust * 0.9), (len(planted), n_cust)
    for r in out:
        assert r.rec_a < r.rec_b
        assert 0 <= r.edit_dist <= linkage.LINK_MAX_DIST
    for r in out:
        if r.rec_b == r.rec_a + linkage.LINK_DIRTY_OFFSET:
            assert r.edit_dist == 1


def test_record_linkage_plan_is_keyed_never_quadratic(spark, sf_dir):
    plan_df = linkage.link_customer_dirty(spark, sf_dir)
    jdf = plan_df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_entity_clusters_merge_planted_pairs(spark, sf_dir):
    """The ER merge step: every clean↔dirty linked pair lands in one
    entity whose canonical record is the min rec_id (the clean one for
    planted pairs), and entity labels are transitively consistent."""
    pairs = linkage.record_linkage_df(linkage._dirty_customers(spark, sf_dir))
    ent = {r.rec_id: r.entity_id for r in
           linkage.entity_clusters_df(spark, pairs).collect()}
    linked = [(r.rec_a, r.rec_b) for r in pairs.collect()]
    assert linked
    for a, b in linked:
        assert ent[a] == ent[b], (a, b)
    for rec, label in ent.items():
        assert label <= rec
        assert ent[label] == label  # canonical record labels itself


def test_stream_linkage_ingest_replay_idempotent(spark, sf_dir, tmp_path):
    """Continuous linkage through a real availableNow stream: the union
    of pair partitions covers every planted clean↔dirty pair the one-shot
    operator finds, and replaying a batch (same batch_id) leaves pairs
    AND both store tables unchanged."""
    from distributed_graph_database_simulation_spark.streaming.ingest import (
        _store_tag,
        linkage_ingest_batch,
        stream_linkage_ingest,
    )

    recs = linkage._dirty_customers(spark, sf_dir)
    feed = str(tmp_path / "feed")
    recs.where(F.col("rec_id") < linkage.LINK_DIRTY_OFFSET).coalesce(1).write.parquet(
        f"{feed}/b0"
    )
    recs.where(F.col("rec_id") >= linkage.LINK_DIRTY_OFFSET).coalesce(1).write.parquet(
        f"{feed}/b1"
    )
    stream = (
        spark.readStream.schema("rec_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/*")
    )
    store = str(tmp_path / "store")
    pairs_path = str(tmp_path / "pairs")
    q = stream_linkage_ingest(spark, stream, store, pairs_path, str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = {(r.rec_a, r.rec_b) for r in spark.read.parquet(pairs_path).collect()}
    planted_one_shot = {
        (r.rec_a, r.rec_b)
        for r in linkage.link_customer_dirty(spark, sf_dir).collect()
        if r.rec_b == r.rec_a + linkage.LINK_DIRTY_OFFSET
    }
    assert planted_one_shot, "one-shot linkage found no planted pairs"
    # every planted pair the one-shot finds, the stream finds (the stream
    # may legitimately emit MORE within-batch-0 links: its batch-0 df cap
    # is over half the corpus)
    assert planted_one_shot <= got

    n_grams = spark.read.parquet(f"{store}/grams").count()
    n_recs = spark.read.parquet(f"{store}/records").count()
    replay = spark.read.parquet(f"{feed}/b1")
    linkage_ingest_batch(spark, replay, 1, store, pairs_path)
    got_after = {(r.rec_a, r.rec_b) for r in spark.read.parquet(pairs_path).collect()}
    assert got_after == got
    assert spark.read.parquet(f"{store}/grams").count() == n_grams
    assert spark.read.parquet(f"{store}/records").count() == n_recs
    tag = _store_tag(store)
    for t in (f"dgds_linkgrams_{tag}", f"dgds_linkrecs_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_global_rank_matches_single_window(spark):
    """The two-pass distributed rank (range-repartition + per-partition
    offsets) must equal the single-partition ROW_NUMBER it replaces."""
    from pyspark.sql.window import Window as W

    records = spark.createDataFrame(
        [(i, f"t-{(i * 37) % 101:03d}") for i in range(300)],
        "rec_id long, text string",
    )
    got = {
        (r.rec_id, r.rank)
        for r in linkage._global_rank(records, F.expr("right(text, 3)")).collect()
    }
    expected = {
        (r.rec_id, r.rank)
        for r in records.withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.expr("right(text, 3)"), "rec_id"))
            .cast("bigint"),
        ).collect()
    }
    assert got == expected


def test_sorted_neighborhood_matches_python_reference(spark):
    """SNM candidates = pairs within `window` ranks of the (key, rec_id)
    sort; verify = exact edit distance. Independent python replay."""
    records = [(i, f"user-{(i * 53) % 97:04d}") for i in range(80)]
    records += [(1000 + i, f"user-{(i * 53) % 97:04d}x"[:9]) for i in range(0, 80, 7)]
    window, key_len, max_dist = 4, 6, 1
    texts = dict(records)
    srt = sorted(
        [(rid, t) for rid, t in records if len(t) >= key_len],
        key=lambda r: (r[1][-key_len:], r[0]),
    )
    expected = set()
    for i, (rid_a, ta) in enumerate(srt):
        for j in range(i + 1, min(i + 1 + window, len(srt))):
            rid_b, tb = srt[j]
            d = _py_levenshtein(ta, tb)
            if d <= max_dist:
                expected.add((min(rid_a, rid_b), max(rid_a, rid_b), d))
    df = spark.createDataFrame(records, "rec_id long, text string")
    got = {
        (r.rec_a, r.rec_b, r.edit_dist)
        for r in linkage.sorted_neighborhood_df(
            df, window=window, key_len=key_len, max_dist=max_dist
        ).collect()
    }
    assert got == expected
    assert expected, "reference found no pairs — test corpus degenerate"


def test_link_sorted_neighborhood_planted_recall(spark, sf_dir):
    """The digit-tail sort key survives the planted prefix deletion, so
    every clean↔dirty pair sorts adjacently and must be recalled."""
    out = linkage.link_sorted_neighborhood(spark, sf_dir).collect()
    planted = {
        (r.rec_a, r.rec_b)
        for r in out
        if r.rec_b == r.rec_a + linkage.LINK_DIRTY_OFFSET
    }
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert len(planted) == n_cust, (len(planted), n_cust)
