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
