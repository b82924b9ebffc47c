"""Unit pins for the r13-new operators: the interleave -> BPE-pack ->
segments composition (WFQ order survives the pack; segments tile each
sequence exactly) and the 1,024-merge BPE scale-up's budget rebinding."""

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.functions.bpe import bpe_encode
from distributed_graph_database_simulation_spark.operators.pipeline import (
    BPE_TOKEN_BUDGETS,
    INTERLEAVE_WEIGHTS,
    interleave_pack_segments_df,
)


@pytest.fixture(scope="module")
def seg_rows(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return interleave_pack_segments_df(docs, INTERLEAVE_WEIGHTS, seq_len=256).collect()


def test_interleave_pack_order_survives(seg_rows):
    """The composition's defining claim: a document's global token start
    (seq_id * L + seg_start of its FIRST segment) is monotone in the WFQ
    order (vt_micro, lang, doc_id) — interleaving decided the order and
    packing preserved it."""
    firsts = {}
    for r in seg_rows:
        key = (r.vt_micro, r.lang, r.doc_id)
        g = r.seq_id * 256 + r.seg_start
        if key not in firsts or g < firsts[key]:
            firsts[key] = g
    ordered = [firsts[k] for k in sorted(firsts)]
    assert ordered == sorted(ordered)
    assert len(ordered) > 100  # non-vacuous at sf0.001


def test_interleave_pack_segments_tile_sequences(seg_rows):
    """Within every sequence, segments are disjoint, sorted, and gap-free;
    every sequence except the final ragged one covers [0, L-1]."""
    by_seq = {}
    for r in seg_rows:
        by_seq.setdefault(r.seq_id, []).append((r.seg_start, r.seg_end))
    last_seq = max(by_seq)
    for seq_id, spans in by_seq.items():
        spans.sort()
        assert spans[0][0] == 0, seq_id
        for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
            assert s1 == e0 + 1, (seq_id, spans)  # gap-free, non-overlapping
        if seq_id != last_seq:
            assert spans[-1][1] == 255, seq_id


def test_interleave_pack_token_mass_conserved(spark, seg_rows):
    """Total packed token mass equals the corpus BPE token total — nothing
    dropped or duplicated by the bucketed cumsum recomposition."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sum(
        len(bpe_encode(r.text))
        for r in docs.select("text").collect()
    )
    got = sum(r.seg_end - r.seg_start + 1 for r in seg_rows)
    assert got == want


def test_bpe_budgets_binding_at_every_sf():
    """keep_ppm < 1e6 requires budget < per-lang total at every shipped sf
    (re-derived for the r13 1,024-merge table: en min 10,343 / fr 3,758)."""
    import os

    import duckdb

    from distributed_graph_database_simulation_spark.functions.bpe import (
        SEP,
        bpe_enc_ctes,
    )

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        totals = dict(
            con.execute(
                f"""WITH {bpe_enc_ctes(cols="lang")}
            SELECT lang, SUM(CASE WHEN norm = '' THEN 0
                ELSE length(s) - length(replace(s, '{SEP}', '')) END)
            FROM enc GROUP BY 1"""
            ).fetchall()
        )
        for lang, budget in BPE_TOKEN_BUDGETS.items():
            assert budget < totals[lang], (sf, lang, budget, totals[lang])


# --- r13 second wave: MIPS reduction, sliding distinct, snapshot diff ----


def test_mips_ranks_by_inner_product_not_cosine(spark):
    """The reduction's defining property: with q=[2,0], c1=[3,0] wins on
    cosine (1.0 vs 0.707) but c2=[10,10] wins on inner product (20 vs 6)
    — mips_topk_df must return c2 first, and the emitted dot must be the
    RAW inner product bit-for-bit (the augmented query coord is 0)."""
    from distributed_graph_database_simulation_spark.operators.similarity import mips_topk_df

    rows = [(0, [2.0, 0.0]), (1, [3.0, 0.0]), (2, [10.0, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    out = mips_topk_df(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [(r.rank, r.neighbor_id, r.dot) for r in out] == [
        (1, 2, 20.0),
        (2, 1, 6.0),
    ]


def test_mips_augmented_corpus_norm_is_constant(spark):
    """Every augmented corpus vector has norm M = max raw norm (the fact
    that makes cosine order equal inner-product order)."""
    from distributed_graph_database_simulation_spark.operators.similarity import _dot

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(200)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    m = emb.agg(F.max(F.sqrt(_dot(F.col("e"), F.col("e"))))).first()[0]
    aug = emb.select(
        F.sqrt(
            _dot(F.col("e"), F.col("e"))
            + (F.lit(m) * F.lit(m) - _dot(F.col("e"), F.col("e")))
        ).alias("an")
    )
    lo, hi = aug.agg(F.min("an"), F.max("an")).first()
    assert abs(lo - m) < 1e-9 and abs(hi - m) < 1e-9


def test_sliding_distinct_users_hand_worked(spark):
    """3 users across 10 days: WAU on day d counts users active in
    [d-6, d]; only active days are emitted."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        sliding_distinct_users_df,
    )

    rows = [
        # (ts, user): u1 on day 1 twice (dedup), u2 on day 1, u2 on day 5,
        # u3 on day 9 (u1/u2's day-1 visits age out of day 9's window;
        # u2's day-5 visit is still inside it)
        ("2024-01-01 03:00:00", 1),
        ("2024-01-01 17:00:00", 1),
        ("2024-01-01 09:00:00", 2),
        ("2024-01-05 12:00:00", 2),
        ("2024-01-09 23:00:00", 3),
    ]
    ev = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    got = {
        str(r.d)[:10]: (r.users_1d, r.users_7d)
        for r in sliding_distinct_users_df(ev).collect()
    }
    assert got == {
        "2024-01-01": (2, 2),  # u1, u2
        "2024-01-05": (1, 2),  # u2 active; window [12-30..01-05] holds u1,u2
        "2024-01-09": (1, 2),  # u3 active; u2 (day 5) in window, day-1 aged out
    }


def test_snapshot_diff_hand_worked(spark):
    """Added / removed / changed / unchanged classification and exact
    character deltas on a 4-doc corpus."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        snapshot_diff_df,
    )

    v1 = spark.createDataFrame(
        [(1, "web", "aaaa"), (2, "web", "bb"), (3, "books", "cc")],
        "doc_id long, source string, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "web", "aaaa"), (2, "web", "bbbbbb"), (4, "books", "dddd")],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source, r.status): (r.n_docs, r.chars_delta)
        for r in snapshot_diff_df(v1, v2).collect()
    }
    assert got == {
        ("web", "unchanged"): (1, 0),
        ("web", "changed"): (1, 4),       # bb -> bbbbbb
        ("books", "removed"): (1, -2),    # cc gone
        ("books", "added"): (1, 4),       # dddd new
    }


def test_snapshot_v2_synthesis_invariants(spark):
    """The deterministic 'next crawl': %17 ids dropped, %13 ids carry the
    rev suffix, %19 ids reappear re-keyed as the negative mirror
    -doc_id-1 with identical text."""
    from distributed_graph_database_simulation_spark.operators.pipeline import _snapshot_v2

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "text")
    )
    v2 = _snapshot_v2(docs).persist()
    assert v2.filter((F.col("doc_id") % 17 == 0) & (F.col("doc_id") >= 0)).count() == 0
    n19 = docs.filter(F.col("doc_id") % 19 == 0).count()
    # added docs are re-keyed as the NEGATIVE mirror -doc_id-1: collision-
    # free against real ids at any corpus size (a +10M offset would alias)
    assert v2.filter(F.col("doc_id") < 0).count() == n19
    changed = v2.filter(
        (F.col("doc_id") % 13 == 0) & (F.col("doc_id") >= 0)
    )
    assert changed.filter(~F.col("text").endswith(" [rev2]")).count() == 0
    v2.unpersist()


def test_mips_rides_the_lsh_stack_with_recall(spark):
    """The reduction's 100 TB claim: norm-augmented vectors flow through
    the UNCHANGED cosine-LSH route and recover most of the exact MIPS
    top-k. r14 raises the pin from 0.5 to 0.8: the multi-probe default
    (MIPS_LSH_PROBES = 1, Hamming-1 buckets per table) clears recall@10
    >= 0.8 at the 1M-vector grid probe and 1.0 at this sf."""
    from distributed_graph_database_simulation_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        mips_topk_df,
        mips_topk_lsh_df,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r.query_id, r.neighbor_id) for r in mips_topk_df(emb, queries).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in mips_topk_lsh_df(emb, queries).collect()
    }
    recall = len(exact & ann) / (N_QUERIES * TOP_K)
    assert recall >= 0.8, recall


def test_crawl_store_delta_idempotent_and_deletes(spark, tmp_path):
    """The crawl digest store's contract: applying a delta twice leaves
    byte-identical state (value-wise MERGE + idempotent delete), and
    deleted ids are gone while changed ids carry the new digest."""
    from distributed_graph_database_simulation_spark.streaming.ingest import (
        crawl_apply_delta,
        crawl_ingest_batch,
        _doc_digest,
    )

    store = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "web", "one"), (2, "web", "two"), (3, "books", "three")],
        "doc_id long, source string, text string",
    )
    crawl_ingest_batch(spark, v1, store)
    ups = spark.createDataFrame(
        [(2, "web", "two-revised"), (9, "books", "nine")],
        "doc_id long, source string, text string",
    )
    dels = spark.createDataFrame([(3,)], "doc_id long")
    crawl_apply_delta(spark, ups, dels, store)
    first = {r.doc_id: (r.source, r.len, r.csum) for r in spark.read.parquet(store).collect()}
    crawl_apply_delta(spark, ups, dels, store)  # replay
    second = {r.doc_id: (r.source, r.len, r.csum) for r in spark.read.parquet(store).collect()}
    assert first == second
    assert set(first) == {1, 2, 9}
    want2 = _doc_digest(ups.where("doc_id = 2")).first()
    assert first[2] == (want2.source, want2.len, want2.csum)


def test_frame_deltas_hand_worked(spark):
    """One synthetic 3-frame video with known byte deltas: frame slices
    'aaaa'|'cccc'|'cccd' give transition L1s of 8 (4 x |c-a|=2... no:
    |'c'-'a'|=2 per byte x 4 = 8) and 1, so total=9, max=8, and with the
    cut threshold at mean-delta > 40 neither transition is a cut."""
    import pandas as pd

    from distributed_graph_database_simulation_spark.operators.multimodal import (
        _frame_delta_batches,
    )

    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "payload": [b"aaaaccccccccd"],  # 13 bytes, 3 frames -> per=4
            "n_frames": [3],
        }
    )
    out = next(_frame_delta_batches(iter([pdf])))
    r = out.iloc[0]
    assert (r.n_frames, r.frame_bytes) == (3, 4)
    # frames: 'aaaa', 'cccc', 'cccc' (13th byte 'd' truncated)
    assert (r.total_delta, r.max_delta, r.n_cuts) == (8, 8, 0)


def test_frame_deltas_detects_planted_cut(spark):
    """A transition whose mean per-byte delta exceeds the threshold is
    counted as a cut: ' '*4 (0x20) -> 'zzzz' (0x7a) has delta 90/byte."""
    import pandas as pd

    from distributed_graph_database_simulation_spark.operators.multimodal import (
        _frame_delta_batches,
    )

    pdf = pd.DataFrame(
        {"media_id": [7], "payload": [b"    zzzz"], "n_frames": [2]}
    )
    r = next(_frame_delta_batches(iter([pdf]))).iloc[0]
    assert (r.total_delta, r.max_delta, r.n_cuts) == (360, 360, 1)


def test_keywords_hand_worked(spark):
    """4-doc corpus where doc 1's distinguishing term must outrank its
    stopword-ish shared terms: 'zebra' appears twice in doc 1 and in only
    2 docs overall, while 'the' is in every doc (idf ln(5/5)=0 -> weight
    0); min_df=2 drops hapaxes entirely."""
    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        keywords_df,
    )

    docs = spark.createDataFrame(
        [
            (1, "the zebra zebra apple"),
            (2, "the zebra banana"),
            (3, "the apple banana"),
            (4, "the orange unique"),
        ],
        "doc_id long, text string",
    )
    rows = keywords_df(docs).collect()
    d1 = sorted((r.rank, r.token) for r in rows if r.doc_id == 1)
    # doc 1 terms passing min_df=2: the(0), zebra(tf2·ln(5/3)), apple(ln(5/3))
    assert d1 == [(1, "zebra"), (2, "apple"), (3, "the")]
    # 'unique' (df=1) never appears anywhere
    assert not [r for r in rows if r.token == "unique"]
    # every doc emits at most 3 rows, ranks contiguous from 1
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())


def test_incremental_quality_routing_hand_worked(spark):
    """Digest routing on a 4-doc snapshot pair: unchanged carries, changed
    and added recompute from v2 text, removed vanishes — and the carried
    score equals what full reprocessing would produce."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        incremental_quality_df,
    )
    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        quality_score_df,
    )

    v1 = spark.createDataFrame(
        [(1, "w", "the cat sat on the mat"), (2, "w", "old text here"),
         (3, "w", "doomed document")],
        "doc_id long, source string, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "w", "the cat sat on the mat"),          # unchanged
         (2, "w", "completely new text body"),        # changed
         (9, "w", "a brand new arrival")],            # added
        "doc_id long, source string, text string",
    )
    got = {r.doc_id: (r.status, r.quality_micro)
           for r in incremental_quality_df(v1, v2).collect()}
    assert set(got) == {1, 2, 9}  # removed id 3 absent
    assert got[1][0] == "carried"
    assert got[2][0] == "recomputed" and got[9][0] == "recomputed"
    import math

    # HALF_UP like Spark's F.round, not Python's banker's round (a doc
    # landing exactly on .5 micro differs between the two).
    full = {r.doc_id: math.floor(r.quality * 1e6 + 0.5)
            for r in quality_score_df(v2.select("doc_id", "text")).collect()}
    assert {k: v[1] for k, v in got.items()} == full  # incremental == full


def test_mode_tie_breaks_lexicographically(spark):
    """On an exact count tie the smallest value wins — the determinism
    native mode() doesn't promise."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        RELATIONAL_QUERIES,
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="mode_pin_")
    spark.createDataFrame(
        [("O", "3-MEDIUM"), ("O", "1-URGENT"), ("O", "1-URGENT"),
         ("O", "3-MEDIUM"), ("F", "5-LOW")],
        "o_orderstatus string, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    fn = RELATIONAL_QUERIES["rel_mode"][0]
    got = {r.o_orderstatus: (r.mode_priority, r.mode_n) for r in fn(spark, d).collect()}
    assert got == {"O": ("1-URGENT", 2), "F": ("5-LOW", 1)}  # tie -> smallest


def test_boilerplate_sentences_hand_worked(spark):
    """A cookie banner shared by 3 docs is removed (threshold met), a
    2-doc sentence survives, order and digests reconstruct exactly."""
    import hashlib

    from distributed_graph_database_simulation_spark.operators.dedup import (
        boilerplate_sentences_df,
    )

    banner = "Accept all cookies"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}. Real prose one. Shared twice."),
            (2, f"{banner}! Totally different text."),
            (3, f"{banner}? Shared twice. More prose."),
            (4, "Unrelated document entirely."),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_sents, r.n_boiler, r.kept_md5)
           for r in boilerplate_sentences_df(docs, min_docs=3).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # the [.!?]+ split consumes the punctuation, so kept text joins the
    # bare sentences
    assert got[1] == (3, 1, md5("Real prose one\nShared twice"))
    assert got[2] == (2, 1, md5("Totally different text"))
    assert got[3] == (3, 1, md5("Shared twice\nMore prose"))
    assert got[4] == (1, 0, md5("Unrelated document entirely"))


def test_boilerplate_fully_boiler_doc_keeps_empty_digest(spark):
    """A doc that is ONLY boilerplate keeps md5('') and n_boiler == n_sents."""
    import hashlib

    from distributed_graph_database_simulation_spark.operators.dedup import (
        boilerplate_sentences_df,
    )

    docs = spark.createDataFrame(
        [(i, "Same banner.") for i in range(1, 5)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_sents, r.n_boiler, r.kept_md5)
           for r in boilerplate_sentences_df(docs, min_docs=3).collect()}
    empty = hashlib.md5(b"").hexdigest()
    assert all(v == (1, 1, empty) for v in got.values())


def test_audio_downsample_hand_worked():
    """Pair-floor decimation on a known byte string: 'ABCDE' (65,66,67,
    68,69) -> [(65+66)//2, (67+68)//2] = [65, 67] = 'AC'; trailing 'E'
    dropped."""
    import hashlib

    import pandas as pd

    from distributed_graph_database_simulation_spark.operators.multimodal import (
        _audio_downsample_batches,
    )

    pdf = pd.DataFrame({"media_id": [0], "payload": [b"ABCDE"]})
    r = next(_audio_downsample_batches(iter([pdf]))).iloc[0]
    assert (r.n_in, r.n_out, r.out_sum) == (5, 2, 65 + 67)
    assert r.out_md5 == hashlib.md5(b"AC").hexdigest()


def test_attribution_last_touch_hand_worked(spark):
    """Purchase credits the most recent preceding touch within horizon:
    u1's click (1h before) wins over the older view; u2's only touch is
    outside the 3-day horizon -> unattributed; a purchase is never its
    own touch."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        attribution_last_touch_df,
    )

    rows = [
        (1, "2024-01-01 08:00:00", 1, "view", 0.0),
        (2, "2024-01-01 11:00:00", 1, "click", 0.0),
        (3, "2024-01-01 12:00:00", 1, "purchase", 10.0),
        (4, "2024-01-01 00:00:00", 2, "view", 0.0),
        (5, "2024-01-05 00:00:01", 2, "purchase", 7.5),  # 4d later: out of range
        (6, "2024-01-02 09:00:00", 3, "purchase", 2.0),  # no touch at all
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")
    got = {r.touch_type: (r.n_purchases, r.value_sum_micro)
           for r in attribution_last_touch_df(ev).collect()}
    assert got == {
        "click": (1, 10_000_000),
        "unattributed": (2, 9_500_000),
    }
