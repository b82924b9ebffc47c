"""Unit pins for the r12-new operators: the deterministic BPE tokenizer
(pure-Python spec vs hand-worked examples, kernel parity, word-boundary
safety) and exact-substring dedup (planted cross-doc runs, the >= 50-token
contract, within-doc repeats excluded)."""

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.functions.bpe import (
    BPE_MERGES,
    END_OF_WORD,
    bpe_encode,
)
from distributed_graph_database_simulation_spark.operators.dedup import (
    EXACT_SUBSTR_TOKENS,
    dup_spans_df,
)


# --- BPE ------------------------------------------------------------------


def test_bpe_merge_table_is_word_local():
    # no FIRST element carries the end-of-word marker -> a merge can
    # never span a word boundary (the module-level assert, re-pinned here
    # so a bad regenerated table fails the suite, not just the import)
    assert all(END_OF_WORD not in a for a, _ in BPE_MERGES)
    assert len(BPE_MERGES) == len(set(BPE_MERGES))  # no duplicate merges
    # r13: a realistic vocabulary, not a contract demo (VERDICT r12 #3)
    assert len(BPE_MERGES) >= 1000
    # every merge's elements are buildable from earlier merges or single
    # chars — a well-formedness property of a genuinely-learned table (a
    # hand-edited table with an orphan composite symbol would dead-slot)
    known = {c for m in BPE_MERGES for c in (m[0] + m[1])}
    built: set[str] = {c for c in known if len(c) == 1} | {END_OF_WORD}
    for a, b in BPE_MERGES:
        assert a in built and b in built, (a, b)
        built.add(a + b)


def test_bpe_encode_hand_worked():
    # high-frequency corpus words collapse to single word tokens under the
    # 1,024-merge table (values re-pinned from the r13 relearn)
    assert bpe_encode("the") == ["the#"]
    assert bpe_encode("scan") == ["scan#"]
    # normalization: case folded, punctuation stripped, whitespace collapsed
    assert bpe_encode("  The   SCAN! ") == ["the#", "scan#"]
    assert bpe_encode("") == []
    assert bpe_encode("!!!") == []
    assert bpe_encode(None) == []  # null text never raises (r12 ADVICE)


def test_bpe_normalization_adversarial_parity():
    """The r12-ADVICE whitespace edge: Python spec, pandas kernel helper,
    and the generated DuckDB normalization must agree on adversarial
    whitespace/unicode — tabs, newlines, NBSP, vertical tab/form feed,
    punctuation-separated words (no phantom empty-word tokens), nulls."""
    import duckdb
    import pandas as pd

    from distributed_graph_database_simulation_spark.functions.bpe import (
        bpe_norm_sql,
        bpe_normalize,
        bpe_normalize_series,
    )

    advs = [
        "\tfoo",
        "foo\n",
        "a\xa0b",
        "a . b",
        None,
        "",
        "!!!",
        "Istanbul KK",
        "MixED CaSe 123",
        "x\vy\fz",
        "  double  space  ",
        "tab\tin\nmiddle",
    ]
    py = [bpe_normalize(t) for t in advs]
    pdp = list(bpe_normalize_series(pd.Series(advs, dtype="object")))
    assert py == pdp
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, c VARCHAR)")
    for i, t in enumerate(advs):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    sql = [r[0] for r in con.execute(f"SELECT {bpe_norm_sql('c')} FROM t ORDER BY i").fetchall()]
    assert py == sql
    # punctuation stripped BEFORE whitespace collapse: no empty words
    assert bpe_normalize("a . b") == "a b"
    assert all(w for w in bpe_normalize("a . b").split(" "))


def test_bpe_tokens_reconstruct_text():
    # lossless: stripping markers and joining tokens recovers the
    # normalized text, for every corpus word and a multi-word sample
    for text in ["merge", "customer", "window", "the fast scan joins"]:
        toks = bpe_encode(text)
        rebuilt = "".join(toks).replace(END_OF_WORD, " ").strip()
        assert rebuilt == " ".join(text.split()), text


def test_bpe_no_cross_word_merges():
    # 'scan' is a single token; adjacent words must not merge through the
    # boundary: 's can' stays two words however the chain runs
    toks = bpe_encode("s can")
    assert "".join(toks).count(END_OF_WORD) == 2
    assert toks[0] in ("s", "s#")
    # the word count is preserved for any input
    assert "".join(bpe_encode("a b c d")).count(END_OF_WORD) == 4


def test_bpe_golden_doc_vocab_covers_corpus(spark, sf_dir):
    """Every normalized word in the documents table is in DOC_VOCAB — the
    precondition for the golden-table oracle to reconstruct every doc's
    symbol string (an OOV word fails loudly; this pin keeps the vocab file
    in sync with the corpus generator)."""
    from distributed_graph_database_simulation_spark.functions.bpe import (
        DOC_VOCAB,
        bpe_normalize,
    )

    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    vocab = set(DOC_VOCAB)
    corpus_words = {w for t in texts for w in bpe_normalize(t).split(" ") if w}
    assert corpus_words <= vocab, corpus_words - vocab


def test_bpe_kernel_matches_python_spec(spark, sf_dir):
    """The Arrow kernel's output equals the row-at-a-time pure-Python
    spec on real corpus docs (first 50) — counts AND exact token heads."""
    import hashlib

    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        text_bpe_encode,
    )

    rows = (
        text_bpe_encode(spark, sf_dir)
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    docs = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    assert len(rows) == 50
    for r in rows:
        toks = bpe_encode(docs[r.doc_id])
        assert r.n_bpe == len(toks), r.doc_id
        assert r.head_tokens == " ".join(toks[:8]), r.doc_id
        enc = "|" + "|".join(toks) if toks else ""
        assert r.enc_md5 == (
            hashlib.md5(enc.encode()).hexdigest() if toks else ""
        ), r.doc_id


# --- exact-substring dedup --------------------------------------------------


@pytest.fixture(scope="module")
def planted_docs(spark):
    """Six docs: a 60-token run shared by docs 0 and 1 (must be found,
    span_tokens >= 60), a 49-token run shared by docs 2 and 3 (one token
    short of the contract, must NOT be found), and doc 4 repeating its own
    60-token run twice WITHIN itself (cross-doc mode must ignore it);
    doc 5 is unique filler."""
    run60 = " ".join(f"w{i}" for i in range(60))
    run49 = " ".join(f"x{i}" for i in range(49))
    fill = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        (0, f"{fill('a', 20)} {run60} {fill('b', 20)}"),
        (1, f"{fill('c', 5)} {run60}"),
        (2, f"{run49} {fill('d', 30)}"),
        (3, f"{fill('e', 30)} {run49}"),
        (4, f"{run60.replace('w', 'z')} {fill('f', 10)} {run60.replace('w', 'z')}"),
        (5, fill("g", 120)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substring_finds_planted_cross_doc_run(spark, planted_docs):
    spans = dup_spans_df(
        planted_docs, k=EXACT_SUBSTR_TOKENS, min_occurrences=2, cross_doc=True
    ).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    # the shared 60-token run is found in both carriers at the right spot
    assert set(by_doc) == {0, 1}
    (s0,) = by_doc[0]
    assert (s0.span_start, s0.span_end) == (20, 79)
    (s1,) = by_doc[1]
    assert (s1.span_start, s1.span_end) == (5, 64)
    # every reported span satisfies the >= 50-token contract
    assert all(r.span_end - r.span_start + 1 >= EXACT_SUBSTR_TOKENS for r in spans)


def test_exact_substring_within_doc_repeat_not_cross_doc(spark, planted_docs):
    # doc 4's self-repeat IS caught by the occurrence-count mode...
    occ = dup_spans_df(
        planted_docs, k=EXACT_SUBSTR_TOKENS, min_occurrences=2, cross_doc=False
    )
    assert occ.where(F.col("doc_id") == 4).count() > 0
    # ...and correctly ignored by the cross-doc (suffix-array) contract
    cross = dup_spans_df(
        planted_docs, k=EXACT_SUBSTR_TOKENS, min_occurrences=2, cross_doc=True
    )
    assert cross.where(F.col("doc_id") == 4).count() == 0


def test_scrub_substring_removes_planted_run(spark, planted_docs):
    from distributed_graph_database_simulation_spark.operators.dedup import (
        scrub_dup_spans_df,
    )

    out = {
        r.doc_id: r
        for r in scrub_dup_spans_df(
            planted_docs,
            k=EXACT_SUBSTR_TOKENS,
            min_occurrences=2,
            cross_doc=True,
        ).collect()
    }
    # carriers lose exactly the 60-token run; everyone else is untouched
    assert out[0].n_words_removed == 60
    assert out[1].n_words_removed == 60
    assert all(out[d].n_words_removed == 0 for d in (2, 3, 4, 5))
    # the scrubbed text is the doc minus the run, order preserved
    assert out[1].text == " ".join(f"c{i}" for i in range(5))


def test_interleave_is_locally_weight_proportional(spark, sf_dir):
    """The WFQ property the operator exists for: in (vt, key, doc_id)
    order, every prefix carries each group in weight proportion, within
    one 'round' of slack — and per-group vt gaps are exactly SCALE // w."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        INTERLEAVE_SCALE,
        INTERLEAVE_WEIGHTS,
        pipe_interleave_sources,
    )

    rows = (
        pipe_interleave_sources(spark, sf_dir)
        .orderBy("vt_micro", "lang", "doc_id")
        .collect()
    )
    # per-group: rank is dense 0..n-1 and vt = (rank+1)*SCALE//w
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        ranks = sorted(x.rank for x in rs)
        assert ranks == list(range(len(rs))), lang
        w = INTERLEAVE_WEIGHTS[lang]
        assert all(
            x.vt_micro == (x.rank + 1) * INTERLEAVE_SCALE // w for x in rs
        ), lang
    # local balance: within any prefix ending at a round boundary, group
    # counts track weight share with at most one round of slack (until a
    # group is exhausted)
    total_w = sum(INTERLEAVE_WEIGHTS.values())
    seen = {la: 0 for la in by_lang}
    smallest = min(len(rs) for rs in by_lang.values())
    horizon = smallest * total_w // max(INTERLEAVE_WEIGHTS.values())
    for i, r in enumerate(rows[:horizon], start=1):
        seen[r.lang] += 1
        for lang, cnt in seen.items():
            share = INTERLEAVE_WEIGHTS[lang] / total_w
            assert abs(cnt - i * share) <= total_w, (i, lang, cnt)


def test_pack_segments_tile_each_sequence(spark, sf_dir):
    """Packing lays chunks end-to-end, so the segment table must TILE
    every sequence: within (shard, seq_id), segments are disjoint,
    contiguous from token 0, and every sequence except the final ragged
    one per shard ends at SEQ_LEN - 1."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        SEQ_LEN,
        pipe_pack_segments,
    )

    rows = pipe_pack_segments(spark, sf_dir).collect()
    by_seq = {}
    last_seq = {}
    for r in rows:
        by_seq.setdefault((r.shard, r.seq_id), []).append((r.seg_start, r.seg_end))
        last_seq[r.shard] = max(last_seq.get(r.shard, -1), r.seq_id)
    assert by_seq
    for (shard, seq_id), segs in by_seq.items():
        segs.sort()
        assert segs[0][0] == 0, (shard, seq_id, segs[0])
        for (a1, b1), (a2, b2) in zip(segs, segs[1:]):
            assert a2 == b1 + 1, (shard, seq_id, (a1, b1), (a2, b2))  # no gap/overlap
        if seq_id < last_seq[shard]:  # full sequences end exactly at L-1
            assert segs[-1][1] == SEQ_LEN - 1, (shard, seq_id, segs[-1])
        else:
            assert segs[-1][1] <= SEQ_LEN - 1


def test_katz_hand_worked_path_graph(spark):
    """Katz on the path 0 -> 1 -> 2 (alpha .5, beta 1, 2 iterations):
    x2 = [1, 1.5, 1.75] — walks of length <= 2 attenuated by alpha^len."""
    from distributed_graph_database_simulation_spark.operators.graph_analytics import (
        katz_centrality,
    )

    graphs = spark.createDataFrame([(1, 3)], "graph_id int, n int")
    edges = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2)], "graph_id int, src int, dst int"
    )
    got = {
        r.vertex: r.score
        for r in katz_centrality(
            spark, graphs, edges, iterations=2, alpha=0.5, beta=1.0
        ).collect()
    }
    assert got == {0: 1.0, 1: 1.5, 2: 1.75}


def test_mad_hand_worked(spark, tmp_path):
    """MAD of [1,2,3,4,100]: median 3, deviations [2,1,0,1,97] -> MAD 1 —
    the 100 outlier moves mean/stddev but not (median, MAD)."""
    import pyspark.sql.functions as F

    from distributed_graph_database_simulation_spark.operators.relational import (
        mad_per_flag,
    )

    sf = str(tmp_path)
    rows = [("A", float(v)) for v in (1, 2, 3, 4, 100)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double"
    ).write.parquet(f"{sf}/lineitem.parquet")
    (r,) = mad_per_flag(spark, sf).collect()
    assert (r.median_qty, r.mad_qty, r.n) == (3.0, 1.0, 5)
