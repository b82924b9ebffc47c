"""Unit pins for the LLM-pipeline suites (dedup / similarity / text / mm).

Oracle-backed operators are covered by tools/check_oracles.py (the t2 gate
mimic); these tests pin the rows-only operators' invariants instead:
simhash determinism + self-dup detection, LSH recall vs the brute-force
baseline, multimodal stub behavior and batch shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from distributed_graph_database_simulation_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    similarity,
    text_analysis,
)


def test_minhash_lsh_equals_exact_jaccard(spark, sf_dir):
    """LSH + exact verification must reproduce the exhaustive pair set."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh == exact
    assert exact, "corpus is expected to contain planted near-dups"


def test_dedup_clusters_transitive_closure(spark, sf_dir):
    """Cluster assignment must be the transitive closure of the pair graph:
    every pair lands in one cluster, cluster_id is the min member, and
    exactly one survivor exists per cluster."""
    pairs = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    labels = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, sf_dir).collect()}
    assert pairs and labels
    # union-find ground truth from the pair list
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.doc_a), find(r.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, set[int]] = {}
    for d in parent:
        groups.setdefault(find(d), set()).add(d)
    expected = {d: min(g) for g in groups.values() for d in g}
    assert labels == expected
    survivors = {r.doc_id for r in dedup.dedup_clusters(spark, sf_dir).collect() if r.is_survivor}
    assert survivors == set(groups)


def test_prefix_filter_equals_count_based_jaccard(spark, sf_dir):
    """The AllPairs-style prefix-filtered path must be lossless: identical
    pair set and jaccard values as the full inverted-index plan."""
    count_based = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    prefix = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup._ngram_jaccard_prefix(spark, sf_dir).collect()
    }
    assert prefix == count_based
    assert count_based


def test_simhash_detects_identical_and_is_deterministic(spark, sf_dir):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=3, text="one two three four five six seven eight"),
        ]
    )
    sh = dedup._shingled(docs)
    sims = {r.doc_id: (r.sim_hi, r.sim_lo) for r in dedup._simhash(sh).collect()}
    assert sims[1] == sims[2]
    assert sims[1] != sims[3]
    for hi, lo in sims.values():  # halves stay in unsigned-32 range
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32
    again = {r.doc_id: (r.sim_hi, r.sim_lo) for r in dedup._simhash(sh).collect()}
    assert sims == again


def test_simhash_pairs_on_corpus(spark, sf_dir):
    pairs = dedup.dedup_simhash(spark, sf_dir).collect()
    assert all(0 <= r.hamming <= 3 for r in pairs)
    assert all(r.doc_a < r.doc_b for r in pairs)


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    """ANN recall against the exact baseline (loose bound; random vectors
    are LSH's worst case, and the contract is 'useful candidates', not
    exactness — exact answers come from sim_topk_bruteforce)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sim_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sim_topk_lsh(spark, sf_dir).collect()
    }
    assert approx, "LSH produced no candidates at all"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall:.2f}"
    # every LSH result is a true vector pair (ids exist, no self-pairs)
    assert all(q != n for q, n in approx)


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    """IVF probes 4/16 lists: recall well above the 25% corpus fraction
    because queries rank their own lists first. Lloyd-refined centroids
    measured 0.84 at sf0.01 (seed-only centroids were ~0.7); the floor
    leaves margin for float-mean jitter across partial-agg orders."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sim_topk_bruteforce(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sim_topk_ivf(spark, sf_dir).collect()
    }
    assert ivf
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.65, f"IVF recall collapsed: {recall:.2f}"


def test_embedding_cosine_tiled_equals_broadcast(spark, sf_dir):
    """The blocked all-pairs path must be bit-identical to the broadcast
    path (shared dimension-major kernel): same pairs, same cosine doubles."""
    broadcast = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    tiled = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in dedup.dedup_embedding_cosine_tiled(spark, sf_dir).collect()
    }
    assert tiled == broadcast
    assert broadcast, "corpus is expected to contain planted near-dup vectors"


def test_cosine_router_byte_cap_forces_blocked_path(spark):
    """A corpus under the ROW cap but over the BYTE cap must take the
    blocked path: the broadcast gate is rows AND estimated driver bytes
    (r04 verdict: the row-only gate would collect ~8 GB at 1M x 1024-dim)."""
    n, dim = 1000, 40_000  # 1000 * (8 + 320_000) bytes ~ 305 MiB > 256 MiB
    assert n <= dedup.COSINE_BROADCAST_CAP
    assert n * (8 + dim * 8) > dedup.COSINE_BROADCAST_MAX_BYTES
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)), lambda i: i.cast("double")
        ).alias("e"),
    )
    plan = dedup._cosine_route(spark, emb)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # blocked applyInPandas path
    assert "MapInPandas" not in plan        # not the broadcast path


def test_cosine_router_small_corpus_stays_broadcast(spark):
    n, dim = 1000, 16
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)), lambda i: i.cast("double")
        ).alias("e"),
    )
    plan = dedup._cosine_route(spark, emb)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_cosine_router_refuses_past_exact_ceiling(spark):
    """Past COSINE_EXACT_MAX_ROWS the blocked path's shuffle replication
    would be unbounded-quadratic; the router must refuse loudly rather
    than ship n * n_blocks vectors."""
    n = dedup.COSINE_EXACT_MAX_ROWS + 1
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("e"),
    )
    with pytest.raises(ValueError, match="dedup_embedding_cosine_prefiltered"):
        dedup._cosine_route(spark, emb)
    # the ceiling itself pins replication <= COSINE_MAX_BLOCKS
    assert -(-dedup.COSINE_EXACT_MAX_ROWS // dedup.COSINE_TILE_ROWS) == dedup.COSINE_MAX_BLOCKS


def test_cosine_prefiltered_equals_exact_on_planted_corpus(spark):
    """The LSH-prefiltered route must reproduce the exact pair set (with
    bit-identical cosines) on a corpus whose true near-dups are planted
    identical vectors — identical vectors share every hyperplane sign, so
    candidate recall is 1.0 there and any divergence is a real bug."""
    import numpy as np

    rng = np.random.RandomState(42)
    dim, n_bg, n_dup = 128, 60, 10
    bg = rng.standard_normal((n_bg, dim))
    rows = [Row(vec_id=i, e=[float(x) for x in bg[i]]) for i in range(n_bg)]
    # plant exact duplicates of the first n_dup background vectors
    rows += [
        Row(vec_id=100 + j, e=[float(x) for x in bg[j]]) for j in range(n_dup)
    ]
    emb = spark.createDataFrame(rows)
    exact = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in dedup._cosine_pairs_blocked(emb, 8).collect()
    }
    pre = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in dedup.dedup_embedding_cosine_prefiltered(spark, emb).collect()
    }
    planted = {(j, 100 + j) for j in range(n_dup)}
    assert planted <= {(a, b) for a, b, _ in exact}
    assert pre == exact


def test_lsh_buckets_are_deterministic(spark, sf_dir):
    df = similarity._with_norm(similarity._emb(spark, sf_dir)).limit(20)
    a = {(r.vec_id, r.table_id): r.bucket for r in similarity._signatures(df).collect()}
    b = {(r.vec_id, r.table_id): r.bucket for r in similarity._signatures(df).collect()}
    assert a == b
    assert len(a) == 20 * similarity.LSH_TABLES


def test_kernel_guard_refuses_oversized_graph(spark):
    """The applyInPandas kernels materialize one graph per task; the guard
    must refuse groups beyond the configured ceiling instead of OOMing."""
    from pyspark.sql import Row

    from distributed_graph_database_simulation_spark.operators.graph_traversal import (
        bfs_levels_small,
    )

    edges = spark.createDataFrame(
        [Row(graph_id=1, src=i, dst=i + 1) for i in range(5)]
    )
    with pytest.raises(Exception, match="too large"):
        bfs_levels_small(spark, edges, [(1, 0)], max_nodes=1).collect()


def test_dfs_kernel_guard_and_deep_path(spark):
    """DFS kernel must (a) refuse graphs over max_nodes with an error, not
    a worker crash, and (b) survive a path graph far deeper than the old
    recursive kernel's C-stack budget (explicit-stack form)."""
    from pyspark.sql import Row

    from distributed_graph_database_simulation_spark.operators.graph_traversal import (
        dfs_leaves,
    )

    deep = spark.createDataFrame(
        [Row(graph_id=1, src=i, dst=i + 1) for i in range(4999)]
    )
    with pytest.raises(Exception, match="over the"):
        dfs_leaves(spark, deep, [(1, 0)], max_nodes=10).collect()
    out = {r.vertex for r in dfs_leaves(spark, deep, [(1, 0)]).collect()}
    assert out == {4999}


def test_pii_scrub_detects_planted_pii(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="reach me at jane.doe@example.com or 5551234567 ok"),
            Row(doc_id=2, text="nothing sensitive in here 123"),
        ]
    )
    out = {r.doc_id: r for r in text_analysis.pii_scrub_df(docs).collect()}
    assert out[1].n_emails == 1 and out[1].n_long_numbers == 1
    assert out[2].n_emails == 0 and out[2].n_long_numbers == 0
    # redaction changes the hash for the PII doc only
    import hashlib

    expected = hashlib.md5(
        b"reach me at <EMAIL> or <NUM> ok"
    ).hexdigest()
    assert out[1].scrubbed_md5 == expected
    assert out[2].scrubbed_md5 == hashlib.md5(b"nothing sensitive in here 123").hexdigest()


def test_repetition_metrics_on_planted_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam"),       # one bigram, repeated
            Row(doc_id=2, text="all words here are unique"),
            Row(doc_id=3, text="solo"),                       # no bigrams
        ]
    )
    out = {r.doc_id: r for r in text_analysis.repetition_df(docs).collect()}
    assert out[1].dup_word_frac == 0.75 and out[1].top_bigram_frac == 1.0
    assert out[2].dup_word_frac == 0.0 and out[2].top_bigram_count == 1
    assert out[3].top_bigram_count == 0 and out[3].top_bigram_frac == 0.0


def test_contamination_flags_benchmark_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=bench_text),                       # benchmark set
            Row(doc_id=11, text=bench_text),                      # fully contaminated
            Row(doc_id=12, text="totally different words entirely here"),
        ]
    )
    out = {r.doc_id: r for r in text_analysis.contamination_df(docs).collect()}
    assert set(out) == {11, 12}  # benchmark docs are not scored
    assert out[11].contamination_frac == 1.0
    assert out[12].contamination_frac == 0.0


def test_decode_image_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"\x89PNG\r\n")


def test_media_table_schema(spark, sf_dir):
    mt = multimodal.media_table(spark, sf_dir)
    assert dict(mt.dtypes) == {
        "media_id": "bigint",
        "payload": "binary",
        "width": "int",
        "height": "int",
        "n_frames": "int",
        "mime": "string",
    }
    row = mt.filter(F.col("media_id") == 0).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray)) and len(row.payload) > 0


def test_frame_sample_covers_every_media(spark, sf_dir):
    frames = multimodal.mm_frame_sample(spark, sf_dir)
    n_media = multimodal.media_table(spark, sf_dir).count()
    got = frames.select("media_id").distinct().count()
    assert got == n_media
    bad = frames.filter((F.col("frame_idx") % multimodal.FRAME_STRIDE) != 0).count()
    assert bad == 0


def test_language_id_scores_consistent(spark, sf_dir):
    out = text_analysis.text_language_id(spark, sf_dir)
    langs = sorted(text_analysis.LANG_MARKERS)
    rows = out.collect()
    for r in rows:
        scores = {la: r[f"s_{la}"] for la in langs}
        best = max(scores.values())
        if best == 0:
            assert r.pred_lang == "und"
        else:
            # alphabetically first argmax wins
            assert r.pred_lang == min(la for la in langs if scores[la] == best)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ estimate vs exact distinct: rsd=0.02 keeps estimates within a
    few percent; pin a loose 10% envelope so sketch regressions surface."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        approx_distinct_parts,
        distinct_parts_per_flag,
    )

    approx = {r.l_returnflag: r.approx_parts for r in approx_distinct_parts(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r.n_parts for r in distinct_parts_per_flag(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        assert abs(est - exact[flag]) <= max(2, 0.10 * exact[flag])


def test_fingerprint_shape_and_window_count(spark, sf_dir):
    fp = text_analysis.text_fingerprint(spark, sf_dir)
    tok = text_analysis.text_token_count(spark, sf_dir)
    joined = fp.join(tok, "doc_id").collect()
    assert joined
    for r in joined:
        assert len(r.fingerprint) == 32 and all(c in "0123456789abcdef" for c in r.fingerprint)
        expected = max(r.ws_tokens - (text_analysis.WINDOW_W - 1), 0)
        assert r.n_windows == expected


def test_udaf_weighted_discount_exact(spark):
    """Grouped-agg pandas UDAF on a hand-computable frame: the basis-point
    integer path must give the exact rational answer, not a float drift."""
    from distributed_graph_database_simulation_spark.operators import udf_surface

    df = spark.createDataFrame(
        [("A", 500, 10), ("A", 1000, 30), ("B", 0, 5)],
        "l_returnflag string, disc_bp long, qty long",
    )
    out = {
        r.l_returnflag: (r.w_avg_discount, r.total_qty)
        for r in df.groupBy("l_returnflag")
        .agg(
            udf_surface._weighted_discount("disc_bp", "qty").alias("w_avg_discount"),
            udf_surface._total_qty("qty").alias("total_qty"),
        )
        .collect()
    }
    # A: (500*10 + 1000*30) / 40 / 10000 = 35000/40/10000 = 0.0875 exactly
    assert out["A"] == (0.0875, 40)
    assert out["B"] == (0.0, 5)


def test_udtf_heavy_tokens_literal(spark):
    """UDTF yields one row per qualifying token, none for sparse docs."""
    from distributed_graph_database_simulation_spark.operators import udf_surface

    spark.udtf.register("heavy_tokens_t", udf_surface._HeavyTokens)
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 9 + ["b"] * 8 + ["c"] * 7)), (2, "x y z")],
        "doc_id long, text string",
    )
    rows = spark.sql(
        "SELECT d.doc_id, t.token, t.n FROM {d} d, LATERAL heavy_tokens_t(d.text) t",
        d=docs,
    ).collect()
    assert {(r.doc_id, r.token, r.n) for r in rows} == {(1, "a", 9), (1, "b", 8)}


def test_bmp_roundtrip_padding_and_order():
    import numpy as np

    # 3x2 RGB, width*3=9 -> row pad to 12: exercises padding, bottom-up,
    # and BGR swap; exact round trip proves all three are undone
    pixels = bytes(range(3 * 2 * 3))
    bmp = multimodal.encode_bmp_rgb24(pixels, 3, 2)
    meta, decoded = multimodal.parse_bmp(bmp)
    assert meta == {"width": 3, "height": 2, "bits_per_pixel": 24}
    assert decoded == pixels
    # raw file really is bottom-up BGR: first stored pixel is the
    # bottom-left one (row 1, pixel 0 = RGB 9,10,11) stored as B,G,R
    body = bmp[54:]
    assert body[0:3] == bytes((11, 10, 9))
    assert np.frombuffer(bmp[:2], dtype="S2")[0] == b"BM"


def test_bmp_top_down_form_parses():
    import struct

    pixels = bytes(range(2 * 2 * 3))
    bmp = bytearray(multimodal.encode_bmp_rgb24(pixels, 2, 2))
    # flip to the top-down form: negate height, reverse stored row order
    bmp[22:26] = struct.pack("<i", -2)
    row = (2 * 3 + 3) & ~3
    body = bmp[54:]
    bmp[54:] = bytes(body[row:]) + bytes(body[:row])
    meta, decoded = multimodal.parse_bmp(bytes(bmp))
    assert meta["height"] == 2 and decoded == pixels


def test_bmp_malformed_raises():
    with pytest.raises(ValueError):
        multimodal.parse_bmp(b"PNG not bmp")
    bmp = multimodal.encode_bmp_rgb24(bytes(12), 2, 2)
    with pytest.raises(ValueError):
        multimodal.parse_bmp(bmp[:-4])


def test_decode_image_real_executes_on_bmp():
    pixels = b"\x01\x02\x03" * 4
    meta, decoded = multimodal.decode_image_real(
        multimodal.encode_bmp_rgb24(pixels, 2, 2)
    )
    assert meta["width"] == 2 and decoded == pixels


def test_decode_audio_real_is_stubbed():
    # non-WAV payloads still need a real audio library -> stub raises
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio_real(b"\x00\x01")


def test_wav_roundtrip_8bit():
    samples = bytes(range(256))
    meta, decoded = multimodal.parse_wav(multimodal.encode_wav_pcm8(samples, 8000))
    assert meta == {
        "sample_rate": 8000,
        "n_channels": 1,
        "bits_per_sample": 8,
        "n_samples": 256,
    }
    assert bytes(decoded) == samples


def test_wav_odd_length_padding_and_unknown_chunks():
    import struct

    # odd-sized data chunk: writer emits a pad byte the parser must not
    # count as a sample, and a LIST chunk between fmt and data must be
    # skipped by the chunk walk
    wav = multimodal.encode_wav_pcm8(b"abc", 16000)
    riff_body = wav[12:]
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    patched = b"RIFF" + struct.pack("<I", 4 + len(listc) + len(riff_body)) + b"WAVE" + listc + riff_body
    meta, decoded = multimodal.parse_wav(patched)
    assert meta["n_samples"] == 3 and bytes(decoded) == b"abc"


def test_wav_16bit_decode():
    import struct

    import numpy as np

    vals = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    data = vals.tobytes()
    fmt_body = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", 16) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    meta, decoded = multimodal.parse_wav(wav)
    assert meta["bits_per_sample"] == 16 and meta["sample_rate"] == 44100
    assert list(decoded) == list(vals)


def test_wav_malformed_raises():
    import struct

    with pytest.raises(ValueError):
        multimodal.parse_wav(b"RIFX\x00\x00\x00\x00WAVE")
    # truncated data chunk
    wav = multimodal.encode_wav_pcm8(b"abcd", 8000)
    with pytest.raises(ValueError):
        multimodal.parse_wav(wav[:-2])
    # non-PCM format code
    fmt_body = struct.pack("<HHIIHH", 3, 1, 8000, 8000, 1, 8)
    body = (
        b"fmt " + struct.pack("<I", 16) + fmt_body
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        multimodal.parse_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    # 16-bit data chunk with a trailing odd byte: must raise, not silently
    # truncate (the docstring's no-mis-decoding contract)
    import numpy as np

    data = np.array([7, -7], dtype="<i2").tobytes() + b"\x01"
    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", 16) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data + b"\x00"
    )
    with pytest.raises(ValueError, match="frame width"):
        multimodal.parse_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_png_roundtrip_all_filters():
    import random

    # >= 5 rows so the encoder's y % 5 schedule exercises every filter
    # (None/Sub/Up/Average/Paeth); exact round trip proves all five
    # unfilters, the chunk walk, and the inflate path
    rng = random.Random(11)
    for w, h in [(3, 5), (7, 9), (1, 6)]:
        pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
        meta, decoded = multimodal.parse_png(multimodal.encode_png(pixels, w, h))
        assert meta == {"width": w, "height": h, "bit_depth": 8, "channels": 3}
        assert decoded == pixels


def test_png_rgba_roundtrip():
    import random

    rng = random.Random(13)
    pixels = bytes(rng.randrange(256) for _ in range(4 * 6 * 4))
    meta, decoded = multimodal.parse_png(
        multimodal.encode_png(pixels, 4, 6, alpha=True)
    )
    assert meta["channels"] == 4 and decoded == pixels


def test_png_idat_split_across_chunks():
    import struct
    import zlib

    # a conforming reader must concatenate multiple IDAT chunks before
    # inflating; re-chunk a valid stream into 1-byte IDATs
    pixels = bytes(range(2 * 5 * 3)) * 1
    enc = multimodal.encode_png(pixels, 2, 5)
    # locate the single IDAT chunk
    pos = 8
    parts = []
    while pos + 8 <= len(enc):
        (length,) = struct.unpack(">I", enc[pos : pos + 4])
        typ = enc[pos + 4 : pos + 8]
        body = enc[pos + 8 : pos + 8 + length]
        parts.append((typ, body))
        pos += 12 + length

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    out = multimodal.PNG_SIG
    for typ, body in parts:
        if typ == b"IDAT":
            for i in range(len(body)):
                out += chunk(b"IDAT", body[i : i + 1])
        else:
            out += chunk(typ, body)
    meta, decoded = multimodal.parse_png(out)
    assert decoded == pixels


def test_png_malformed_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.parse_png(b"BM not a png")
    enc = multimodal.encode_png(bytes(3 * 5 * 3), 3, 5)
    # flipped byte -> CRC failure, not a silent mis-decode
    corrupt = bytearray(enc)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.parse_png(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated"):
        multimodal.parse_png(enc[:-20])
    # interlaced flag rejected loudly
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    bad = (
        multimodal.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.parse_png(bad)


def test_decode_image_real_executes_on_png():
    pixels = b"\x05\x06\x07" * 10
    meta, decoded = multimodal.decode_image_real(multimodal.encode_png(pixels, 2, 5))
    assert meta["width"] == 2 and decoded == pixels


def test_decode_audio_real_executes_on_wav():
    samples, rate = multimodal.decode_audio_real(
        multimodal.encode_wav_pcm8(b"hello", 12000)
    )
    assert rate == 12000 and bytes(samples) == b"hello"


def test_audio_features_literal(spark):
    """Hand-computable PCM stats: bytes 'a?a' = (97, 63, 97) around the
    100 centerline -> 0 crossings; ' Ã ' style crossing pairs counted."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "payload": [b"aza", b""],  # a=97 z=122: crossings at 97->122, 122->97
            "width": [1, 1],
            "height": [1, 1],
            "n_frames": [1, 1],
            "mime": ["fake/raw", "fake/raw"],
        }
    )
    out = list(multimodal._audio_batches(iter([pdf])))[0]
    r1 = out[out.media_id == 1].iloc[0]
    assert r1.n_samples == 3 and r1.peak == 122 and r1.zero_crossings == 2
    assert abs(r1.rms - ((97 * 97 + 122 * 122 + 97 * 97) / 3) ** 0.5) < 1e-12
    r2 = out[out.media_id == 2].iloc[0]
    assert r2.n_samples == 0 and r2.peak == -1 and r2.zero_crossings == 0 and r2.rms == 0.0


def test_chunk_windows_literal(spark):
    """100-token doc -> chunks [0..63] and [48..99]; 5-token doc -> itself."""
    import hashlib

    from distributed_graph_database_simulation_spark.operators import pipeline

    long_toks = [f"t{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(long_toks)), (2, "a b c d e")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.chunk_id): (r.chunk_md5, r.n_tokens)
        for r in pipeline.chunk_windows_df(docs).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows == {
        (1, 0): (md5(" ".join(long_toks[0:64])), 64),
        (1, 1): (md5(" ".join(long_toks[48:100])), 52),
        (2, 0): (md5("a b c d e"), 5),
    }


def test_chunk_windows_tail_boundary(spark):
    """Exactly CHUNK tokens -> one chunk; CHUNK+1 -> two (ragged 17-token tail)."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    c = pipeline.CHUNK
    docs = spark.createDataFrame(
        [(1, " ".join(["x"] * c)), (2, " ".join(["x"] * (c + 1)))],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): r.n_tokens
        for r in pipeline.chunk_windows_df(docs).collect()
    }
    assert got == {(1, 0): c, (2, 0): c, (2, 1): c + 1 - pipeline.STRIDE}


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators import pipeline

    a = pipeline.text_sample_stratified(spark, sf_dir).collect()
    b = pipeline.text_sample_stratified(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # no rand() anywhere
    for r in a:  # every kept row satisfies the arithmetic-hash predicate
        assert (r.doc_id * 2654435761) % 1_000_000 == r.sample_bucket
        assert r.sample_bucket < pipeline.SAMPLE_PPM.get(r.lang, 1_000_000)
    # full-rate strata are kept in their entirety
    docs = pipeline._docs(spark, sf_dir)
    n_de = docs.where("lang = 'de'").count()
    assert sum(1 for r in a if r.lang == "de") == n_de


def test_common_neighbors_vs_python(spark, sf_dir):
    """Cross-check the CN join pipeline against an independent Python
    adjacency-set computation on the same scale edges."""
    from distributed_graph_database_simulation_spark import fixtures
    from distributed_graph_database_simulation_spark.operators.graph_queries import (
        common_neighbors_scale,
    )

    edges = fixtures.scale_edges_df(spark, sf_dir).collect()
    adj: dict[int, set[int]] = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    expected = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for v in verts[i + 1 :]:
            if v in adj[u]:
                continue
            c = len(adj[u] & adj[v])
            if c:
                expected[(u, v)] = c
    got = {
        (r.u, r.v): r.common_neighbors
        for r in common_neighbors_scale(spark, sf_dir).collect()
    }
    assert got == expected


def test_shard_assign_layout_properties(spark, sf_dir):
    """Positions are a 0-based contiguous sequence per shard; assignment is
    the documented arithmetic; ordering matches an independent Python sort."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    rows = pipeline.text_shard_assign(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.shard == (r.doc_id * 2246822519) % pipeline.N_SHARDS
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.pos)
        assert [r.pos for r in members] == list(range(len(members)))
        expected_order = sorted(
            (r.doc_id for r in members),
            key=lambda d: ((d * 2654435761) % 1_000_003, d),
        )
        assert [r.doc_id for r in members] == expected_order


def test_signature_literal_planes_match_inline_hash_derivation(spark, sf_dir):
    """_signatures materializes hyperplane weights as hashlib-computed array
    literals (driver-side, no job); buckets must be bit-identical to an
    inline Spark F.md5 derivation of the same weights — the cross-engine
    pin that lets the DuckDB oracle re-derive the planes with its own md5()."""
    df = similarity._with_norm(similarity._emb(spark, sf_dir)).limit(8)
    got = {
        (r.vec_id, r.table_id): r.bucket
        for r in similarity._signatures(df).collect()
    }
    dim = F.size(F.col("e"))
    q = F.transform(
        "e", lambda x: F.round(x * similarity.LSH_QUANT_SCALE).cast("bigint")
    )

    def plane(t, b):
        def component(i):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(str(t)), F.lit(str(b)), i.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            return h % similarity.LSH_PLANE_MOD - similarity.LSH_PLANE_CENTER

        return component

    for t in range(similarity.LSH_TABLES):
        bucket = F.lit(0).cast("long")
        for b in range(similarity.LSH_BITS):
            proj = F.aggregate(
                F.zip_with(
                    q,
                    F.transform(F.sequence(F.lit(0), dim - 1), plane(t, b)),
                    lambda x, p: x * p,
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            bucket = bucket.bitwiseOR(
                F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), b))
                .otherwise(F.lit(0).cast("long"))
            )
        ref = {r.vec_id: r.b for r in df.select("vec_id", bucket.alias("b")).collect()}
        for vid, bk in ref.items():
            assert got[(vid, t)] == bk, (vid, t)


def test_cosine_router_and_prefilter_handle_empty_corpus(spark):
    """Zero-row corpora must flow through both the router and the LSH
    prefilter without erroring (dim probe returns no row; plane literals
    degenerate to empty arrays)."""
    empty = (
        spark.range(0)
        .select(F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("e"))
        .where(F.lit(False))
    )
    assert dedup._cosine_route(spark, empty).count() == 0
    assert dedup.dedup_embedding_cosine_prefiltered(spark, empty).count() == 0


def test_prepare_training_corpus_invariants(spark, sf_dir):
    """The composed pipeline (quality -> exact dedup -> near-dup clusters ->
    sample -> shard) must produce a corpus that is unique, near-dup-free,
    quality-gated, densely sharded, and deterministic."""
    from distributed_graph_database_simulation_spark.operators import pipeline

    out = pipeline.prepare_training_corpus(spark, sf_dir).collect()
    assert out, "pipeline produced an empty corpus"
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))
    assert all(r.quality >= 0.5 for r in out)
    # exact-dup free: no two survivors share normalized text
    docs = dedup._docs(spark, sf_dir).where(F.col("doc_id").isin(ids))
    texts = docs.select(F.regexp_replace(F.trim("text"), r"\s+", " ").alias("t"))
    assert texts.count() == texts.distinct().count()
    # near-dup free: the minhash pair-finder finds nothing in the output
    assert dedup.minhash_lsh_df(docs).count() == 0
    # dense per-shard positions 0..n_i-1
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions))), shard
    # deterministic end to end
    again = pipeline.prepare_training_corpus(spark, sf_dir).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_incremental_dedup_against_store_matches_one_shot(spark, sf_dir, tmp_path):
    """Ingesting a corpus in two batches through the signature store must
    find exactly the one-shot pair set minus old-old pairs (reported when
    batch one was ingested), with identical jaccard values."""
    docs = dedup._docs(spark, sf_dir)
    split = 250
    old = docs.where(F.col("doc_id") < split)
    new = docs.where(F.col("doc_id") >= split)
    store = str(tmp_path / "sigstore")
    dedup.write_signature_store(old, store)

    incremental = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_against_store(spark, new, store).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_df(docs).collect()
    }
    expected = {
        (a, b, j) for a, b, j in full if a >= split or b >= split
    }
    assert incremental == expected
    assert incremental, "split corpus should contain cross-batch near-dups"
    # batch-one pairs were the store's own ingest report
    old_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_df(old).collect()
    }
    assert old_pairs | incremental == full


# --- duplicated-span (substring-level) dedup ------------------------------

def _py_dup_spans(rows, k, min_occ):
    """Independent pure-Python reference for dup_spans_df: k-gram counting
    on gram TEXT (the Spark side keys on xxhash64 of the same text — a
    collision could only differ, which is the point of the cross-check),
    then per-doc interval merge."""
    from collections import Counter

    words = {
        doc_id: " ".join(text.split()).split(" ") for doc_id, text in rows
    }
    counts = Counter()
    per_doc = {}
    for doc_id, w in words.items():
        grams = [tuple(w[i : i + k]) for i in range(len(w) - k + 1)]
        per_doc[doc_id] = grams
        counts.update(grams)
    spans = set()
    for doc_id, grams in per_doc.items():
        pos = [i for i, g in enumerate(grams) if counts[g] >= min_occ]
        i = 0
        while i < len(pos):
            start, end, n = pos[i], pos[i] + k - 1, 1
            while i + 1 < len(pos) and pos[i + 1] <= end + 1:
                i += 1
                end = max(end, pos[i] + k - 1)
                n += 1
            spans.add((doc_id, start, end, n))
            i += 1
    return spans


def test_dup_spans_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(12))  # 12-word shared block
    docs = spark.createDataFrame(
        [
            (0, f"u0a u0b u0c {boiler} u0d u0e u0f u0g u0h"),
            (1, f"{boiler} v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),
            (2, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.dup_spans_df(docs, k=8, min_occurrences=2).collect()
    }
    # doc 0: boiler words occupy positions 3..14 -> grams 3..7 (5 grams)
    # doc 1: positions 0..11 -> grams 0..4 (5 grams); doc 2: clean
    assert got == {(0, 3, 14, 5), (1, 0, 11, 5)}


def test_dup_spans_match_python_reference(spark, sf_dir):
    docs = dedup._docs(spark, sf_dir).where(F.col("doc_id") < 120)
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    expected = _py_dup_spans(rows, k=8, min_occ=2)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in dedup.dup_spans_df(docs, k=8, min_occurrences=2).collect()
    }
    assert got == expected
    assert got, "synthetic corpus should contain duplicated 8-gram spans"


def test_scrub_dup_spans_removes_exactly_spanned_words(spark):
    boiler = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (0, f"u0 u1 {boiler} u2 u3"),
            (1, f"{boiler} v0 v1 v2"),
            (2, "w0  w1   w2 w3 w4 w5 w6 w7 w8 w9"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_words_removed)
        for r in dedup.scrub_dup_spans_df(docs, k=8, min_occurrences=2).collect()
    }
    assert got[0] == ("u0 u1 u2 u3", 10)
    assert got[1] == ("v0 v1 v2", 10)
    # untouched doc passes through normalized, nothing removed
    assert got[2] == ("w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", 0)


# --- sequence packing -----------------------------------------------------

def _py_pack_sequences(chunk_rows, seq_len):
    """Independent reference: shard by doc hash, order by (scramble,
    doc_id, chunk_id), running token total -> (seq_id, seq_offset)."""
    out = {}
    by_shard = {}
    for doc_id, chunk_id, n_tokens in chunk_rows:
        shard = (doc_id * 2246822519) % 16
        scramble = (doc_id * 2654435761) % 1_000_003
        by_shard.setdefault(shard, []).append(
            (scramble, doc_id, chunk_id, n_tokens)
        )
    for shard, rows in by_shard.items():
        cum = 0
        for scramble, doc_id, chunk_id, n_tokens in sorted(rows):
            out[(doc_id, chunk_id)] = (
                shard, cum // seq_len, cum % seq_len, n_tokens
            )
            cum += n_tokens
    return out


def test_pack_sequences_matches_python_reference(spark, sf_dir):
    chunks = pipeline.chunk_windows_df(pipeline._docs(spark, sf_dir)).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    rows = [(r.doc_id, r.chunk_id, r.n_tokens) for r in chunks.collect()]
    expected = _py_pack_sequences(rows, seq_len=2048)
    got = {
        (r.doc_id, r.chunk_id): (r.shard, r.seq_id, r.seq_offset, r.n_tokens)
        for r in pipeline.pack_sequences_df(chunks).collect()
    }
    assert got == expected
    assert len(got) == len(rows)
    # multiple sequences actually formed, offsets stay in range
    assert max(seq_id for _, seq_id, _, _ in got.values()) > 0
    assert all(0 <= off < 2048 for _, _, off, _ in got.values())


def test_pack_sequences_is_deterministic_and_dense(spark, sf_dir):
    chunks = pipeline.chunk_windows_df(pipeline._docs(spark, sf_dir)).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    a = pipeline.pack_sequences_df(chunks, seq_len=512).collect()
    b = pipeline.pack_sequences_df(chunks, seq_len=512).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # per shard: token mass accounts for every seq boundary (concat-and-split
    # means seq_ids are dense 0..floor(total/seq_len))
    from collections import defaultdict

    total = defaultdict(int)
    max_seq = defaultdict(int)
    for r in a:
        total[r.shard] += r.n_tokens
        max_seq[r.shard] = max(max_seq[r.shard], r.seq_id)
    for shard, tok in total.items():
        # the last chunk START lands in a seq no later than floor(total/512)
        assert max_seq[shard] <= tok // 512


# --- per-source cap -------------------------------------------------------

def test_cap_per_source_matches_python_reference(spark, sf_dir):
    docs = pipeline._docs(spark, sf_dir)
    rows = [(r.doc_id, r.source) for r in docs.select("doc_id", "source").collect()]
    cap = 15
    by_source = {}
    for doc_id, source in rows:
        scr = (doc_id * 2654435761) % 1_000_003
        by_source.setdefault(source, []).append((scr, doc_id))
    expected = set()
    for source, lst in by_source.items():
        for rank, (_, doc_id) in enumerate(sorted(lst)):
            if rank < cap:
                expected.add(doc_id)
    got = {
        r.doc_id for r in pipeline.cap_per_source_df(docs, cap).collect()
    }
    assert got == expected
    # the cap actually binds on this corpus, and schema passes through
    assert len(got) < len(rows)
    out_cols = pipeline.cap_per_source_df(docs, cap).columns
    assert out_cols == docs.columns


def test_cap_per_source_is_deterministic_and_capped(spark, sf_dir):
    docs = pipeline._docs(spark, sf_dir)
    a = {r.doc_id for r in pipeline.cap_per_source_df(docs, 10).collect()}
    b = {r.doc_id for r in pipeline.cap_per_source_df(docs, 10).collect()}
    assert a == b
    per_source = (
        pipeline.cap_per_source_df(docs, 10)
        .groupBy("source")
        .count()
        .collect()
    )
    assert per_source and all(r["count"] <= 10 for r in per_source)


# --- token-budget mixture sampling ---------------------------------------

def test_sample_token_budget_matches_python_reference(spark, sf_dir):
    docs = pipeline._docs(spark, sf_dir)
    rows = [
        (r.doc_id, r.lang, len(" ".join(r.text.split()).split(" ")))
        for r in docs.select("doc_id", "lang", "text").collect()
    ]
    totals = {}
    for _, lang, n in rows:
        totals[lang] = totals.get(lang, 0) + n
    budgets = {"en": 5_000, "fr": 10_000_000}  # en binds hard, fr passes whole
    ppm = {
        lang: min(1_000_000, budgets[lang] * 1_000_000 // tot)
        for lang, tot in totals.items()
        if lang in budgets
    }
    expected = {
        (doc_id, lang, n, ppm.get(lang, 1_000_000))
        for doc_id, lang, n in rows
        if (doc_id * 2654435761) % 1_000_000 < ppm.get(lang, 1_000_000)
    }
    got = {
        (r.doc_id, r.lang, r.n_tokens, r.keep_ppm)
        for r in pipeline.sample_token_budget_df(docs, budgets).collect()
    }
    assert got == expected
    # en was actually downsampled; unbudgeted langs passed through whole
    langs_in = {lang for _, lang, _ in rows}
    kept_en = sum(1 for d, l, n, p in got if l == "en")
    total_en = sum(1 for _, l, _ in rows if l == "en")
    assert 0 < kept_en < total_en
    for lang in langs_in - set(budgets):
        assert sum(1 for _, l, _, _ in got if l == lang) == sum(
            1 for _, l, _ in rows if l == lang
        )


def test_sample_token_budget_realized_tokens_near_budget(spark, sf_dir):
    docs = pipeline._docs(spark, sf_dir)
    budget = {"en": 8_000}
    kept = pipeline.sample_token_budget_df(docs, budget)
    realized = (
        kept.where(F.col("lang") == "en").agg(F.sum("n_tokens")).first()[0]
    )
    # doc-granular hash sampling: realized concentrates around the budget
    assert 0.5 * budget["en"] <= realized <= 1.5 * budget["en"]


def test_prepare_training_corpus_scrub_stage(spark, sf_dir):
    """With scrub_spans=True the substring pass runs before exact dedup:
    output keeps the composed invariants (unique, dense shards,
    deterministic) and survivors' SCRUBBED texts are exact-dup-free."""
    out = pipeline.prepare_training_corpus(spark, sf_dir, scrub_spans=True).collect()
    assert out
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions))), shard
    # survivors are exact-dup-free AFTER scrubbing (the property the stage
    # ordering buys: boilerplate-only differences collapse pre-dedup)
    docs = dedup._docs(spark, sf_dir)
    quality = text_analysis.quality_score_df(docs).select("doc_id", "quality")
    passing = docs.join(
        quality.where(F.col("quality") >= 0.5).select("doc_id"), "doc_id"
    )
    scrubbed = dedup.scrub_dup_spans_df(passing).where(F.col("doc_id").isin(ids))
    assert scrubbed.select("text").count() == scrubbed.select("text").distinct().count()
    again = pipeline.prepare_training_corpus(spark, sf_dir, scrub_spans=True).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


# --- per-epoch reshuffle + empty-input hardening --------------------------

def test_epoch_reshuffle_decorrelates_order_keeps_shards(spark, sf_dir):
    """epoch=0 must be the historical layout bit-for-bit; later epochs keep
    shard membership and dense positions but permute the read order."""
    docs = pipeline._docs(spark, sf_dir)
    base = {(r.doc_id): (r.shard, r.pos) for r in pipeline.shard_assign_df(docs).collect()}
    e0 = {(r.doc_id): (r.shard, r.pos) for r in pipeline.shard_assign_df(docs, epoch=0).collect()}
    assert e0 == base
    e1 = {(r.doc_id): (r.shard, r.pos) for r in pipeline.shard_assign_df(docs, epoch=1).collect()}
    # shard membership invariant, order changed for a meaningful fraction
    assert {d: s for d, (s, _) in e1.items()} == {d: s for d, (s, _) in base.items()}
    moved = sum(1 for d in base if base[d][1] != e1[d][1])
    assert moved > len(base) // 4, f"epoch salt barely moved anything: {moved}"
    # dense positions per shard in every epoch
    by_shard = {}
    for d, (s, p) in e1.items():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    # deterministic per epoch
    again = {(r.doc_id): (r.shard, r.pos) for r in pipeline.shard_assign_df(docs, epoch=1).collect()}
    assert again == e1


def test_new_ops_empty_corpus(spark):
    """Every new library operator must be total over an empty frame —
    empty result, correct schema, no exceptions."""
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert dedup.dup_spans_df(empty_docs).count() == 0
    assert dedup.scrub_dup_spans_df(empty_docs).count() == 0
    empty_chunks = spark.createDataFrame([], "doc_id long, chunk_id int, n_tokens int")
    assert pipeline.pack_sequences_df(empty_chunks).count() == 0
    assert pipeline.cap_per_source_df(empty_docs, 10).count() == 0
    assert pipeline.sample_token_budget_df(empty_docs, {"en": 1000}).count() == 0


# --- unigram log-probability quality score --------------------------------

def test_unigram_logprob_matches_python_reference(spark, sf_dir):
    """Spark scorer vs an independent Python unigram model, small vocab so
    the OOV floor path is exercised on real tokens."""
    import math
    from collections import Counter

    docs = text_analysis._docs(spark, sf_dir).where(F.col("doc_id") < 200)
    rows = [(r.doc_id, " ".join(r.text.split()).split(" "))
            for r in docs.select("doc_id", "text").collect()]
    counts = Counter(w for _, ws in rows for w in ws)
    total = sum(counts.values())
    vocab_size = 25
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    bits = {w: round(1_000_000.0 * -math.log2(c / float(total))) for w, c in vocab}
    floor = round(1_000_000.0 * math.log2(float(total)))
    expected = {}
    for doc_id, ws in rows:
        s = sum(bits.get(w, floor) for w in ws)
        expected[doc_id] = (len(ws), s // len(ws))
    got = {
        r.doc_id: (r.n_tokens, r.bits_micro_per_token)
        for r in text_analysis.unigram_logprob_df(docs, vocab_size=vocab_size).collect()
    }
    assert got == expected
    # OOV floor actually exercised and scores vary
    assert len({v for _, v in got.values()}) > 1


def test_unigram_logprob_flags_junk(spark):
    """A junk document of unique gibberish must score strictly worse
    (higher bits/token) than repetitive typical text."""
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat and the cat sat again and the cat sat"),
         (1, "the dog sat on the mat and the dog sat again and the dog sat"),
         (2, "zq9x kvf2 pq7w mmz3 yyb8 qqr4 zzk1 vvn6 ccd5 bbt0 hhg2 jjl9 wwe3 rrt7")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.bits_micro_per_token
        for r in text_analysis.unigram_logprob_df(docs, vocab_size=10).collect()
    }
    assert got[2] > got[0] and got[2] > got[1]


# --- Gopher-rule composite quality gate -----------------------------------

def test_gopher_rules_matches_python_reference(spark, sf_dir):
    """Every measure, flag, and the composite keep vs an independent Python
    evaluation on the real corpus; each rule must be non-vacuous (both
    outcomes present) so a green gate row certifies real structure."""
    from collections import Counter

    docs = text_analysis._docs(spark, sf_dir)
    rows = [(r.doc_id, " ".join(r.text.split()).split(" "))
            for r in docs.select("doc_id", "text").collect()]
    expected = {}
    for doc_id, ws in rows:
        n = len(ws)
        mwl = (1_000_000 * sum(len(w) for w in ws)) // n
        stops = len({w for w in ws if w in text_analysis.GOPHER_STOPWORDS})
        topf = (1_000_000 * max(Counter(ws).values())) // n
        f1 = text_analysis.GOPHER_WORD_MIN <= n <= text_analysis.GOPHER_WORD_MAX
        f2 = (text_analysis.GOPHER_MWL_MIN_MICRO <= mwl
              <= text_analysis.GOPHER_MWL_MAX_MICRO)
        f3 = stops >= text_analysis.GOPHER_STOP_MIN
        f4 = topf <= text_analysis.GOPHER_TOPFRAC_MAX_MICRO
        expected[doc_id] = (n, mwl, stops, topf, f1, f2, f3, f4,
                            f1 and f2 and f3 and f4)
    got = {
        r.doc_id: (r.n_words, r.mean_word_len_micro, r.n_stop_distinct,
                   r.top_word_frac_micro, r.flag_word_count, r.flag_mean_len,
                   r.flag_stopwords, r.flag_repetition, r.keep)
        for r in text_analysis.gopher_rules_df(docs).collect()
    }
    assert got == expected
    # composite and the data-driven rules both fire both ways on this corpus
    keeps = {v[-1] for v in got.values()}
    assert keeps == {True, False}
    assert {v[4] for v in got.values()} == {True, False}  # word count
    assert {v[6] for v in got.values()} == {True, False}  # stopwords


# --- interpolated bigram LM ------------------------------------------------

def test_bigram_logprob_matches_python_reference(spark, sf_dir):
    """Spark scorer vs an independent Python interpolated bigram model
    (doc-initial tokens score unigram-only; λ = BIGRAM_LAMBDA)."""
    import math
    from collections import Counter

    docs = text_analysis._docs(spark, sf_dir).where(F.col("doc_id") < 150)
    rows = [(r.doc_id, " ".join(r.text.split()).split(" "))
            for r in docs.select("doc_id", "text").collect()]
    uni = Counter(w for _, ws in rows for w in ws)
    total = float(sum(uni.values()))
    bi = Counter((ws[i - 1], ws[i]) for _, ws in rows for i in range(1, len(ws)))
    ctx = Counter()
    for (a, _), c in bi.items():
        ctx[a] += c
    lam = text_analysis.BIGRAM_LAMBDA
    expected = {}
    for doc_id, ws in rows:
        s = 0
        for i, w in enumerate(ws):
            if i == 0:
                p = uni[w] / total
            else:
                p = lam * bi[(ws[i - 1], w)] / ctx[ws[i - 1]] + (1 - lam) * uni[w] / total
            s += round(1_000_000.0 * -math.log2(p))
        expected[doc_id] = (len(ws), s // len(ws))
    got = {
        r.doc_id: (r.n_tokens, r.bits_micro_per_token)
        for r in text_analysis.bigram_logprob_df(docs).collect()
    }
    assert got == expected


def test_bigram_logprob_is_context_aware(spark):
    """Two documents with IDENTICAL unigram profiles: one repeats a fixed
    word order (predictable bigrams), one cycles permutations (every
    neighbor pair different). The bigram model must separate them while a
    unigram model by construction cannot."""
    ordered = " ".join("alpha beta gamma delta" for _ in range(6))
    shuffled = "alpha beta gamma delta beta alpha delta gamma gamma delta alpha beta delta gamma beta alpha alpha gamma beta delta beta delta alpha gamma"
    docs = spark.createDataFrame(
        [(0, ordered), (1, shuffled)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.bits_micro_per_token
        for r in text_analysis.bigram_logprob_df(docs).collect()
    }
    uni = {
        r.doc_id: r.bits_micro_per_token
        for r in text_analysis.unigram_logprob_df(docs, vocab_size=10).collect()
    }
    assert got[0] < got[1]        # ordered text is more predictable
    assert uni[0] == uni[1]       # unigram genuinely cannot tell them apart


# --- content-defined chunking ----------------------------------------------

def _cdc_reference(ws):
    """Independent Python CDC: boundary after pos p iff md5 of the trailing
    CDC_GRAM-token window starts with the mask nibble."""
    import hashlib

    K = pipeline.CDC_GRAM
    bounds = [
        p for p in range(K, len(ws) + 1)
        if hashlib.md5(" ".join(ws[p - K:p]).encode()).hexdigest()[0]
        == pipeline.CDC_MASK_HEX
    ]
    chunks, start = [], 1
    cuts = bounds if bounds and bounds[-1] == len(ws) else bounds + [len(ws)]
    for cid, end in enumerate(cuts):
        text = " ".join(ws[start - 1:end])
        chunks.append(
            (cid, start, end - start + 1,
             hashlib.md5(text.encode()).hexdigest())
        )
        start = end + 1
    return chunks


def test_cdc_chunks_matches_python_reference(spark, sf_dir):
    docs = pipeline._docs(spark, sf_dir).where(F.col("doc_id") < 100)
    rows = [(r.doc_id, " ".join(r.text.split()).split(" "))
            for r in docs.select("doc_id", "text").collect()]
    expected = {
        (doc_id, cid): (start, n, md5)
        for doc_id, ws in rows
        for cid, start, n, md5 in _cdc_reference(ws)
    }
    got = {
        (r.doc_id, r.chunk_id): (r.start_pos, r.n_tokens, r.chunk_md5)
        for r in pipeline.cdc_chunks_df(docs).collect()
    }
    assert got == expected
    # the corpus must actually produce multi-chunk docs (boundaries fire)
    assert len(got) > len(rows)


def test_cdc_chunks_are_insertion_shift_invariant(spark):
    """THE content-defined property: prepending one token shifts every
    fixed-stride chunk but leaves all CDC chunks beyond the first
    re-hashed window identical. This is why dedup storage uses CDC."""
    base = [f"w{(i * 2654435761) % 997}" for i in range(300)]
    shifted = ["inserted"] + base
    docs = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(shifted))], "doc_id long, text string"
    )
    out = pipeline.cdc_chunks_df(docs).collect()
    a = {r.chunk_md5 for r in out if r.doc_id == 0}
    b = {r.chunk_md5 for r in out if r.doc_id == 1}
    assert len(a) > 3  # several chunks, or the test is vacuous
    # every original chunk except (at most) the one containing the
    # insertion point reappears verbatim in the shifted document
    assert len(a - b) <= 1
    # fixed-stride chunking shares nothing after a one-token shift
    fx = pipeline.chunk_windows_df(docs).collect()
    fa = {r.chunk_md5 for r in fx if r.doc_id == 0}
    fb = {r.chunk_md5 for r in fx if r.doc_id == 1}
    assert len(fa & fb) == 0


# --- persisted IVF index --------------------------------------------------

def test_kmeans_quantized_matches_python_reference(spark, sf_dir):
    """Quantized Lloyd vs an independent Python implementation on the real
    corpus: identical assignments, distances, and cluster sizes after the
    fixed iteration count (exact integer arithmetic end to end)."""
    vecs = {
        r.vec_id: [round((x + similarity.KMEANS_SHIFT) * similarity.KMEANS_SCALE)
                   for x in r.e]
        for r in similarity._emb(spark, sf_dir).collect()
    }
    k, iters = similarity.KMEANS_K, similarity.KMEANS_ITERS
    cents = {i: vecs[v] for i, v in enumerate(sorted(vecs)[:k])}
    assign = {}
    for _ in range(iters):
        for vid, q in vecs.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(q, c)), cid)
                for cid, c in cents.items()
            )
            assign[vid] = (best[1], best[0])
        new = {}
        for cid in cents:
            members = [vecs[v] for v, (c, _) in assign.items() if c == cid]
            if members:
                new[cid] = [sum(col) // len(members) for col in zip(*members)]
            else:
                new[cid] = cents[cid]
        cents = new
    got = {
        r.vec_id: (r.cluster_id, r.dist_sq)
        for r in similarity.sim_kmeans(spark, sf_dir).collect()
    }
    assert got == assign
    # every cluster is populated at this sf (vacuous-certification guard)
    assert len({c for c, _ in got.values()}) == k


def test_kmeans_assignment_broadcasts_centroids_not_corpus(spark, sf_dir):
    """The assignment join must broadcast the k-row centroid side; the
    corpus must never be broadcast and the update must partial-aggregate."""
    df = similarity.sim_kmeans(spark, sf_dir)
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") >= 1  # k-row centroid side
    assert "partial_sum" in plan or "partial_count" in plan


def test_ivf_index_roundtrip_equals_in_memory(spark, sf_dir, tmp_path):
    """Search against the persisted index must equal the in-memory IVF
    query exactly (same deterministic centroids, same probes, same exact
    re-rank)."""
    emb = similarity._emb(spark, sf_dir)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, emb, idx)
    queries = similarity._with_norm(emb).where(
        F.col("vec_id") < similarity.N_QUERIES
    )
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.sim_topk_ivf_index(spark, queries, idx).collect()
    }
    expected = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.sim_topk_ivf(spark, sf_dir).collect()
    }
    assert got == expected
    assert got


def test_ivf_index_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """The probed-list read must prune at the partition level: the cent_id
    predicate appears in PartitionFilters, and fewer than all lists scan."""
    emb = similarity._emb(spark, sf_dir)
    idx = str(tmp_path / "ivf2")
    similarity.build_ivf_index(spark, emb, idx)
    one_query = similarity._with_norm(emb).where(F.col("vec_id") == 0)
    df = similarity.sim_topk_ivf_index(spark, one_query, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the index-lists scan (path .../lists) must carry the cent_id predicate
    # as a PARTITION filter, not a data filter
    # identify the index-lists scan by its column set (Location strings are
    # truncated for long tmp paths): it is the only scan reading cent_id
    lists_scan = next(
        seg for seg in plan.split("FileScan")
        if "cent_id" in seg[:200] and "PartitionFilters" in seg
    )
    partition_clause = lists_scan.split("PartitionFilters", 1)[1][:250]
    assert "cent_id" in partition_clause, partition_clause


def test_select_top_quality_matches_python_reference(spark, sf_dir):
    """Per-language quantile thresholding vs an independent Python
    computation of the same exact (interpolated) percentile."""
    docs = pipeline._docs(spark, sf_dir)
    scored = {
        r.doc_id: (r.lang, r.quality)
        for r in docs.join(
            text_analysis.quality_score_df(docs).select("doc_id", "quality"),
            "doc_id",
        ).select("doc_id", "lang", "quality").collect()
    }
    frac = 0.4
    by_lang = {}
    for doc_id, (lang, q) in scored.items():
        by_lang.setdefault(lang, []).append(q)

    def interp_percentile(vals, p):
        vals = sorted(vals)
        k = (len(vals) - 1) * p
        lo, hi = int(k), min(int(k) + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * (k - lo)

    thr = {lang: interp_percentile(v, 1.0 - frac) for lang, v in by_lang.items()}
    expected = {d for d, (lang, q) in scored.items() if q >= thr[lang]}
    got = {
        r.doc_id
        for r in pipeline.select_top_quality_df(spark, docs, keep_fraction=frac).collect()
    }
    assert got == expected
    # the filter binds per language
    kept_by_lang = {}
    for d in got:
        kept_by_lang.setdefault(scored[d][0], 0)
    for lang, vals in by_lang.items():
        kept = sum(1 for d in got if scored[d][0] == lang)
        assert 0 < kept < len(vals)


# --- event funnel ---------------------------------------------------------

def test_funnel_matches_python_reference(spark, sf_dir):
    """Funnel state machine vs an independent Python fold over the same
    (ts, event_id)-sorted event stream."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        funnel_df,
    )
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    steps = ["view", "click", "purchase"]
    horizon_min = 7 * 24 * 60  # events span ~30 days per user at sf0.001
    events = load_table(spark, sf_dir, "events")
    rows = [
        (r.user_id, int(r.ts.timestamp() * 1_000_000), r.event_id, r.event_type)
        for r in events.where(F.col("event_type").isin(steps))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ]
    by_user = {}
    for uid, us, eid, etype in rows:
        by_user.setdefault(uid, []).append((us, eid, etype))
    horizon_us = horizon_min * 60 * 1_000_000
    expected = {}
    for uid, evs in by_user.items():
        stage, t0 = 0, None
        for us, eid, etype in sorted(evs):
            if stage < len(steps) and etype == steps[stage] and (
                stage == 0 or (us > t0 and us <= t0 + horizon_us)
            ):
                if stage == 0:
                    t0 = us
                stage += 1
        expected[uid] = (stage, t0)
    got = {
        r.user_id: (
            r.stage_reached,
            None
            if r.funnel_start_ts is None
            else int(r.funnel_start_ts.timestamp() * 1_000_000),
        )
        for r in funnel_df(events, steps, horizon_minutes=horizon_min).collect()
    }
    assert got == expected
    # funnel actually discriminates on this corpus
    stages = {s for s, _ in got.values()}
    assert len(stages) > 1 and max(stages) == 3


def test_funnel_horizon_and_order_semantics(spark):
    """Literal pins: order must be respected (click before view doesn't
    count) and the horizon bounds the whole funnel from step 1."""
    from datetime import datetime

    from distributed_graph_database_simulation_spark.operators.relational import (
        funnel_df,
    )

    def ev(eid, uid, minute, etype):
        return (eid, datetime(2026, 1, 1, 10, minute), uid, etype, 0.0, "{}")

    events = spark.createDataFrame(
        [
            # user 1: clean 3-step funnel
            ev(1, 1, 0, "view"), ev(2, 1, 5, "click"), ev(3, 1, 10, "purchase"),
            # user 2: click precedes view -> only reaches stage 1 via view,
            # then purchase without an intervening click stays stage 1
            ev(4, 2, 0, "click"), ev(5, 2, 5, "view"), ev(6, 2, 10, "purchase"),
            # user 3: purchase outside the 15-minute horizon from view
            ev(7, 3, 0, "view"), ev(8, 3, 5, "click"), ev(9, 3, 30, "purchase"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        r.user_id: r.stage_reached
        for r in funnel_df(
            events, ["view", "click", "purchase"], horizon_minutes=15
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2}


# --- mergeable distinct-count sketch store --------------------------------

def test_distinct_sketch_store_merges_batches_exactly(spark, sf_dir, tmp_path):
    """Two-batch sketch ingestion must estimate EXACTLY what a one-shot
    sketch over the union estimates (HLL union is max-per-register,
    order-insensitive), and land within the HLL error envelope of truth."""
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    store = str(tmp_path / "sketches")
    pipeline.write_distinct_sketch(
        events.where(F.col("event_id") % 2 == 0), "user_id", "event_type", store, 0
    )
    pipeline.write_distinct_sketch(
        events.where(F.col("event_id") % 2 == 1), "user_id", "event_type", store, 1
    )
    merged = {
        r.group_key: r.n_distinct_estimate
        for r in pipeline.read_distinct_estimates(spark, store).collect()
    }
    one_shot = {
        r.group_key: r.est
        for r in events.groupBy(F.col("event_type").alias("group_key"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == one_shot
    truth = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for g, est in merged.items():
        assert abs(est - truth[g]) <= max(2, 0.05 * truth[g]), (g, est, truth[g])
    # replay idempotence: rewriting batch 1 changes nothing
    pipeline.write_distinct_sketch(
        events.where(F.col("event_id") % 2 == 1), "user_id", "event_type", store, 1
    )
    again = {
        r.group_key: r.n_distinct_estimate
        for r in pipeline.read_distinct_estimates(spark, store).collect()
    }
    assert again == merged


# --- z-order layout -------------------------------------------------------

def test_zorder_layout_clusters_both_dimensions(spark):
    """Every output partition's bounding box must be small in BOTH
    clustering columns — the property single-column sorting cannot give
    (its trailing column spans the full range in every file)."""
    from pyspark.sql.functions import spark_partition_id

    n = 40_000
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).cast("double").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).cast("double").alias("y"),
    )
    zed = pipeline.zorder_layout_df(df, ["x", "y"], n_files=16)
    boxes = (
        zed.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
            F.count("*").alias("cnt"),
        )
        .collect()
    )
    assert len(boxes) >= 6
    total_area = 10_000.0 * 10_000.0
    areas = [r.dx * r.dy for r in boxes if r.cnt > 100]
    # each well-populated file covers a small fraction of the value space.
    # Margins are deliberately loose: repartitionByRange samples its
    # boundaries with session-state-dependent seeds, so box shapes wobble
    # run to run (observed flake in a 200-test session); the property
    # itself has ~5x headroom (ideal boxes are ~6% of the space here).
    assert areas and max(areas) < 0.5 * total_area
    assert sum(areas) / len(areas) < 0.2 * total_area
    # contrast: a plain sort by x leaves y spanning ~everything per file
    plain = (
        df.repartitionByRange(16, "x")
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("dy"), F.count("*").alias("cnt"))
        .collect()
    )
    plain_dy = [r.dy for r in plain if r.cnt > 100]
    z_dy = [r.dy for r in boxes if r.cnt > 100]
    assert sum(z_dy) / len(z_dy) < 0.75 * (sum(plain_dy) / len(plain_dy))


def test_zorder_preserves_rows_and_is_deterministic(spark, sf_dir):
    docs = pipeline._docs(spark, sf_dir).select("doc_id", "n_chars")
    zed = pipeline.zorder_layout_df(docs, ["doc_id", "n_chars"], n_files=8)
    assert zed.count() == docs.count()
    a = sorted((r.doc_id, r.zval) for r in zed.collect())
    b = sorted(
        (r.doc_id, r.zval)
        for r in pipeline.zorder_layout_df(docs, ["doc_id", "n_chars"], n_files=8).collect()
    )
    assert a == b


# --- interval overlap join ------------------------------------------------

def test_interval_overlap_join_matches_python_reference(spark):
    """Bucketized interval join vs brute-force Python overlap check,
    including multi-bucket spans (no duplicate pairs) and an equi-key."""
    import random as _random

    from distributed_graph_database_simulation_spark.operators.relational import (
        interval_overlap_join_df,
    )

    rng = _random.Random(99)
    L = [(i, rng.randrange(2), rng.randrange(0, 5000)) for i in range(400)]
    left_rows = [(i, k, s, s + rng.randrange(1, 400)) for i, k, s in L]
    R = [(i, rng.randrange(2), rng.randrange(0, 5000)) for i in range(300)]
    right_rows = [(i, k, s, s + rng.randrange(1, 400)) for i, k, s in R]
    left = spark.createDataFrame(left_rows, "lid long, key int, start long, end long")
    right = spark.createDataFrame(right_rows, "rid long, key int, start long, end long")
    expected = {
        (li, ri)
        for li, lk, ls, le in left_rows
        for ri, rk, rs, re_ in right_rows
        if lk == rk and ls < re_ and rs < le
    }
    got = {
        (r.l_lid, r.r_rid)
        for r in interval_overlap_join_df(left, right, bucket_width=256, on=["key"]).collect()
    }
    assert got == expected
    assert got, "random intervals should overlap"
    # robustness across bucket widths (correctness must not depend on the knob)
    for bw in (64, 1024):
        got_bw = {
            (r.l_lid, r.r_rid)
            for r in interval_overlap_join_df(left, right, bucket_width=bw, on=["key"]).collect()
        }
        assert got_bw == expected, bw


def test_interval_overlap_join_stays_keyed(spark):
    from distributed_graph_database_simulation_spark.operators.relational import (
        interval_overlap_join_df,
    )

    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") * 10).alias("start"),
        (F.col("id") * 10 + 15).alias("end"),
    )
    right = spark.range(100).select(
        F.col("id").alias("rid"), (F.col("id") * 10 + 5).alias("start"),
        (F.col("id") * 10 + 20).alias("end"),
    )
    df = interval_overlap_join_df(left, right, bucket_width=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_sketch_store_merge_rank_error_and_replay(spark, sf_dir, tmp_path):
    """KLL quantile store over the real events table: merged two-batch
    estimates must land within the k=200 rank-error envelope of truth
    (verified by TRUE rank of the estimated value, the only meaningful
    KLL check since compaction is sampled), track n exactly, and batch
    replay must replace — not duplicate — its own partition."""
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    store = str(tmp_path / "qsketches")
    pipeline.write_quantile_sketch(
        events.where(F.col("event_id") % 2 == 0), "value", "event_type", store, 0
    )
    pipeline.write_quantile_sketch(
        events.where(F.col("event_id") % 2 == 1), "value", "event_type", store, 1
    )
    got = {
        r.group_key: r
        for r in pipeline.read_quantile_estimates(
            spark, store, [0.1, 0.5, 0.9]
        ).collect()
    }
    truth = {
        r["event_type"]: sorted(x["value"] for x in r["vals"])
        for r in events.groupBy("event_type")
        .agg(F.collect_list(F.struct("value")).alias("vals"))
        .collect()
    }
    assert set(got) == set(truth)
    for g, vals in truth.items():
        n = len(vals)
        assert got[g].n == n
        for q, col in ((0.1, "q_0_1"), (0.5, "q_0_5"), (0.9, "q_0_9")):
            est = got[g][col]
            true_rank = sum(1 for v in vals if v <= est) / n
            assert abs(true_rank - q) <= 0.05, (g, q, est, true_rank)
    # replay batch 1: same store state (partition replaced, not appended)
    rows_before = spark.read.parquet(store).count()
    pipeline.write_quantile_sketch(
        events.where(F.col("event_id") % 2 == 1), "value", "event_type", store, 1
    )
    assert spark.read.parquet(store).count() == rows_before
    merged_again = {
        r.group_key: r.n
        for r in pipeline.read_quantile_estimates(spark, store, [0.5]).collect()
    }
    assert merged_again == {g: len(v) for g, v in truth.items()}


def test_theta_sketch_store_set_algebra_matches_truth(spark, sf_dir, tmp_path):
    """Theta store over the real events table: pairwise union /
    intersection / difference estimates across event_type slices must
    match exact distinct counts (small-cardinality regime: theta sketches
    are exact below their sampling threshold), and batch replay must not
    inflate anything."""
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    store = str(tmp_path / "theta")
    pipeline.write_theta_sketch(
        events.where(F.col("event_id") % 2 == 0), "user_id", "event_type", store, 0
    )
    pipeline.write_theta_sketch(
        events.where(F.col("event_id") % 2 == 1), "user_id", "event_type", store, 1
    )
    pipeline.write_theta_sketch(  # replay batch 1
        events.where(F.col("event_id") % 2 == 1), "user_id", "event_type", store, 1
    )
    got = {
        (r.group_a, r.group_b): r
        for r in pipeline.read_theta_set_estimates(spark, store).collect()
    }
    users = {
        r["event_type"]: {x["user_id"] for x in r["us"]}
        for r in events.groupBy("event_type")
        .agg(F.collect_set(F.struct("user_id")).alias("us"))
        .collect()
    }
    names = sorted(users)
    assert set(got) == {(x, y) for i, x in enumerate(names) for y in names[i + 1:]}
    for (ga, gb), r in got.items():
        ua, ub = users[ga], users[gb]
        assert round(r.n_a) == len(ua) and round(r.n_b) == len(ub)
        assert round(r.n_union) == len(ua | ub)
        assert round(r.n_intersection) == len(ua & ub)
        assert round(r.n_diff) == len(ua - ub)


def test_token_cooccurrence_pmi_matches_python_reference(spark):
    """PMI co-occurrence graph vs an independent Python reference
    implementing the documented contract (top-N by tf with token
    tie-break, doc-frequency probabilities, natural-log PMI)."""
    import math

    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        token_cooccurrence_pmi,
    )

    corpus = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cat and dog and cat"),
        (3, "a completely different sentence entirely"),
        (4, "the cat and the dog sat"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id LONG, text STRING")
    top_n, min_docs = 4, 2
    got = {
        (r.token_a, r.token_b): r
        for r in token_cooccurrence_pmi(docs, top_n, min_docs).collect()
    }

    import re
    from collections import Counter

    doc_tops = {}
    for doc_id, text in corpus:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]
        tf = Counter(toks)
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        doc_tops[doc_id] = {t for t, _ in ranked}
    df_tok = Counter(t for tops in doc_tops.values() for t in tops)
    pair_docs = Counter()
    for tops in doc_tops.values():
        ts = sorted(tops)
        for i, x in enumerate(ts):
            for y in ts[i + 1:]:
                pair_docs[(x, y)] += 1
    d = len(corpus)
    want = {
        p: (c, df_tok[p[0]], df_tok[p[1]], math.log(c * d / (df_tok[p[0]] * df_tok[p[1]])))
        for p, c in pair_docs.items()
        if c >= min_docs
    }
    assert set(got) == set(want)
    for p, (c, da, db, pmi) in want.items():
        r = got[p]
        assert (r.n_docs_pair, r.n_docs_a, r.n_docs_b) == (c, da, db)
        assert r.pmi == pytest.approx(pmi, rel=1e-12)


def test_token_cooccurrence_pmi_on_documents_table(spark, sf_dir):
    """Real documents table: output is canonical (a < b), bounded by the
    per-doc cap, and PMI is consistent with its own counts."""
    import math

    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        token_cooccurrence_pmi,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    out = token_cooccurrence_pmi(docs, top_tokens_per_doc=8).collect()
    assert out
    for r in out[:200]:
        assert r.token_a < r.token_b
        assert r.n_docs_pair <= min(r.n_docs_a, r.n_docs_b)
        assert r.pmi == pytest.approx(
            math.log(r.n_docs_pair * n_docs / (r.n_docs_a * r.n_docs_b)), rel=1e-9
        )


def test_random_project_matches_numpy_and_preserves_distances(spark, sf_dir):
    """JL projection on the real embeddings table: (a) bit-level agreement
    with an independent numpy reference using the documented rng contract,
    (b) pairwise Euclidean distances preserved within the JL envelope."""
    import numpy as np

    from distributed_graph_database_simulation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out_dim, seed = 64, 7
    got = {
        r.vec_id: np.array(r.projected)
        for r in similarity.random_project(
            emb, "vec_id", "embedding", out_dim, seed
        ).collect()
    }
    raw = {
        r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()
    }
    in_dim = len(next(iter(raw.values())))
    planes = np.random.default_rng(seed).standard_normal((in_dim, out_dim))
    for vid, v in raw.items():
        want = v @ planes / np.sqrt(out_dim)
        assert np.allclose(got[vid], want, rtol=1e-9, atol=1e-12)
    ids = sorted(raw)[:60]
    dist_ratios = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d_raw = np.linalg.norm(raw[a] - raw[b])
            if d_raw == 0:
                continue
            d_proj = np.linalg.norm(got[a] - got[b])
            dist_ratios.append(d_proj / d_raw)
    med = float(np.median(dist_ratios))
    assert 0.8 < med < 1.2
    assert float(np.mean(np.abs(np.array(dist_ratios) - 1.0))) < 0.25


def test_resample_forward_fill_matches_python_reference(spark, sf_dir):
    """Gap-filled per-user resampling of the real events table vs an
    independent Python reference (same bucket floor, last-by-(ts, value)
    head, forward fill)."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        resample_forward_fill_df,
    )
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    step = 6 * 3600
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    got = {
        (r.key, r.bucket_ts): (r.value, r.observed)
        for r in resample_forward_fill_df(
            events, "user_id", "ts", "value", step
        ).collect()
    }
    rows = events.select(
        "user_id", F.unix_timestamp("ts").alias("ts"), "value"
    ).collect()
    import datetime

    per_key = {}
    for r in rows:
        per_key.setdefault(r.user_id, []).append((r.ts, float(r.value)))
    want = {}
    for key, obs in per_key.items():
        heads = {}
        for ts, v in obs:
            bkt = ts // step
            if bkt not in heads or (ts, v) > heads[bkt]:
                heads[bkt] = (ts, v)
        b0, b1 = min(heads), max(heads)
        last = None
        for bkt in range(b0, b1 + 1):
            observed = bkt in heads
            if observed:
                last = heads[bkt][1]
            want[(key, datetime.datetime.utcfromtimestamp(bkt * step))] = (
                last,
                observed,
            )
    assert set(got) == set(want)
    for k, (v, obs) in want.items():
        gv, gobs = got[k]
        assert gobs == obs and gv == pytest.approx(v, rel=1e-12)
    # gaps actually exercised
    assert any(not obs for (_, obs) in want.values())


def test_scd2_history_matches_python_reference(spark, sf_dir):
    """SCD2 intervals from the real events change log vs an independent
    Python reference; intervals must tile each key's timeline with no
    overlap and exactly one current row."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        scd2_history_df,
    )
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    got = scd2_history_df(events, "user_id", "ts", ["event_type", "value"]).collect()
    rows = events.select("user_id", "ts", "event_type", "value").collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.user_id, {}).setdefault(r.ts, []).append(
            (r.event_type, r.value)
        )
    want = {}
    for key, by_ts in per_key.items():
        tss = sorted(by_ts)
        for i, ts in enumerate(tss):
            et, v = max(by_ts[ts])
            nxt = tss[i + 1] if i + 1 < len(tss) else None
            want[(key, ts)] = (nxt, et, v, nxt is None)
    assert {(r.key, r.valid_from) for r in got} == set(want)
    for r in got:
        nxt, et, v, cur = want[(r.key, r.valid_from)]
        assert (r.valid_to, r.event_type, r.is_current) == (nxt, et, cur)
        assert r.value == pytest.approx(v, rel=1e-12)
    by_key_current = {}
    for r in got:
        by_key_current[r.key] = by_key_current.get(r.key, 0) + (1 if r.is_current else 0)
    assert all(c == 1 for c in by_key_current.values())


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment 1.0 while
    Jaccard is small; scores must match an independent Python set
    reference exactly."""
    from distributed_graph_database_simulation_spark.operators.dedup import (
        containment_df,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i}" for i in range(60))
    corpus = [
        (0, short),
        (1, filler + " " + short + " " + filler.replace("word", "tail")),
        (2, "completely unrelated text about nothing shared here at all"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id LONG, text STRING")
    got = {
        (r.doc_a, r.doc_b): r
        for r in containment_df(docs, n=3, min_containment=0.9).collect()
    }
    assert set(got) == {(0, 1)}
    r = got[(0, 1)]

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sa, sb = shingles(corpus[0][1]), shingles(corpus[1][1])
    inter = len(sa & sb)
    assert (r.n_common, r.n_a, r.n_b) == (inter, len(sa), len(sb))
    assert r.containment_a_in_b == pytest.approx(1.0)
    assert r.containment_b_in_a == pytest.approx(inter / len(sb), rel=1e-12)
    # symmetric Jaccard would have rejected this pair at any useful cut
    assert inter / len(sa | sb) < 0.1


def test_rolling_zscore_matches_python_reference(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators.relational import (
        rolling_zscore_df,
    )
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    win = 12 * 3600
    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 6)
    got = {
        (r.key, r.ts): (r.n_window, r.mean_w, r.z, r.is_anomaly)
        for r in rolling_zscore_df(events, "user_id", "ts", "value", win, 1.0).collect()
    }
    rows = events.select(
        "user_id", "ts", F.unix_timestamp("ts").alias("s"), "value"
    ).collect()
    import statistics

    per_key = {}
    for r in rows:
        per_key.setdefault(r.user_id, []).append((r.s, r.ts, float(r.value)))
    n_anom = 0
    for key, obs in per_key.items():
        for s, ts, v in obs:
            trailing = [x for (xs, _, x) in obs if s - win <= xs <= s]
            n = len(trailing)
            mean = sum(trailing) / n
            z = None
            if n >= 2:
                sd = statistics.stdev(trailing)
                if sd > 0:
                    z = (v - mean) / sd
            gn, gm, gz, ga = got[(key, ts)]
            assert gn == n
            assert gm == pytest.approx(mean, rel=1e-12)
            if z is None:
                assert gz is None and ga is None
            else:
                assert gz == pytest.approx(z, rel=1e-9)
                assert ga == (abs(z) > 1.0)
                n_anom += 1 if abs(z) > 1.0 else 0
    assert n_anom > 0  # threshold actually fires somewhere


def test_split_train_val_test_deterministic_and_cross_table(spark, sf_dir):
    """Split must partition exactly, reproduce across runs AND across
    different tables sharing the key, approximate its ppm fractions, and
    redraw under a different seed."""
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = {
        r.doc_id: r.split
        for r in pipeline.split_train_val_test(docs, "doc_id", 100_000, 100_000).collect()
    }
    b = {
        r.doc_id: r.split
        for r in pipeline.split_train_val_test(docs, "doc_id", 100_000, 100_000).collect()
    }
    assert a == b
    # same ids via a DIFFERENT table: identical membership
    other = spark.createDataFrame(
        [(i,) for i in list(a)[:200]], "doc_id long"
    )
    c = {
        r.doc_id: r.split
        for r in pipeline.split_train_val_test(other, "doc_id", 100_000, 100_000).collect()
    }
    assert all(c[i] == a[i] for i in c)
    n = len(a)
    from collections import Counter

    frac = Counter(a.values())
    assert abs(frac["val"] / n - 0.1) < 0.05
    assert abs(frac["test"] / n - 0.1) < 0.05
    assert frac["train"] / n > 0.7
    d = {
        r.doc_id: r.split
        for r in pipeline.split_train_val_test(docs, "doc_id", 100_000, 100_000, seed=2).collect()
    }
    assert d != a


def test_tfidf_matches_python_reference(spark, sf_dir):
    import math
    import re
    from collections import Counter

    from distributed_graph_database_simulation_spark.operators.text_analysis import (
        tfidf_df,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).where(F.col("doc_id") < 40)
    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.tfidf)
        for r in tfidf_df(docs, min_df=2).collect()
    }
    rows = docs.collect()
    tf = {}
    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", r.text.lower().strip()) if t]
        for t, c in Counter(toks).items():
            tf[(r.doc_id, t)] = c
    df_tok = Counter(t for (_, t) in tf)
    d = len(rows)
    want = {
        (i, t): (c, df_tok[t], c * math.log((1 + d) / (1 + df_tok[t])))
        for (i, t), c in tf.items()
        if df_tok[t] >= 2
    }
    assert set(got) == set(want)
    for k, (c, dfv, w) in want.items():
        gc, gdf, gw = got[k]
        assert (gc, gdf) == (c, dfv)
        assert gw == pytest.approx(w, rel=1e-12)


def test_winsorize_clips_to_exact_group_percentiles(spark, sf_dir):
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = pipeline.winsorize_df(events, "event_type", "value", 0.05, 0.95).collect()
    truth = {
        r["event_type"]: sorted(x["value"] for x in r["vals"])
        for r in events.groupBy("event_type")
        .agg(F.collect_list(F.struct("value")).alias("vals"))
        .collect()
    }

    def pct(vals, q):
        # linear interpolation, matching Spark's percentile()
        k = (len(vals) - 1) * q
        f, c = int(k), min(int(k) + 1, len(vals) - 1)
        return vals[f] + (vals[c] - vals[f]) * (k - f)

    clipped_any = 0
    for r in out:
        lo, hi = pct(truth[r.event_type], 0.05), pct(truth[r.event_type], 0.95)
        assert r.value_lo == pytest.approx(lo, rel=1e-9)
        assert r.value_hi == pytest.approx(hi, rel=1e-9)
        assert r.value_winsorized == pytest.approx(
            min(max(r.value, lo), hi), rel=1e-12
        )
        if r.value_winsorized != r.value:
            clipped_any += 1
    assert clipped_any > 0


def test_skyline_matches_python_reference(spark, sf_dir):
    """rel_skyline vs an O(n^2) Python dominance check, and the local-prune
    kernel must be a pure optimization: every pruned row is dominated."""
    from distributed_graph_database_simulation_spark.operators import relational
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    rows = [(r.p_partkey, r.p_size, r.p_retailprice) for r in part.collect()]

    def dominated(a):
        return any(
            b[2] <= a[2] and b[1] >= a[1] and (b[2] < a[2] or b[1] > a[1])
            for b in rows
        )

    want = {r for r in rows if not dominated(r)}
    got = {
        (r.p_partkey, r.p_size, r.p_retailprice)
        for r in relational.skyline_parts(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) >= 1


def test_skyline_keeps_exact_ties(spark):
    """Rows equal on both dimensions dominate neither way: all are kept."""
    from distributed_graph_database_simulation_spark.operators.relational import (
        SKYLINE_PARTS_SQL,
    )

    assert "p_size > a.p_size" in SKYLINE_PARTS_SQL  # strict disjunct pinned
    import pandas as pd

    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 5.0), (3, 9, 5.0), (4, 10, 6.0)],
        "p_partkey bigint, p_size int, p_retailprice double",
    )
    from pyspark.sql import functions as SF
    from distributed_graph_database_simulation_spark.operators import relational

    # drive the same two-phase plan over a literal frame via temp view swap
    a, b = df.alias("a"), df.alias("b")
    dom = (
        (SF.col("b.p_retailprice") <= SF.col("a.p_retailprice"))
        & (SF.col("b.p_size") >= SF.col("a.p_size"))
        & (
            (SF.col("b.p_retailprice") < SF.col("a.p_retailprice"))
            | (SF.col("b.p_size") > SF.col("a.p_size"))
        )
    )
    got = {r.p_partkey for r in a.join(b, dom, "left_anti").collect()}
    assert got == {1, 2}  # the duplicate pair survives, dominated rows drop


def test_skyline_routed_broadcast_path_matches_entry(spark, sf_dir):
    """The routed library entry point on the small-frontier path must equal
    the pinned two-phase entry exactly."""
    from distributed_graph_database_simulation_spark.operators import relational
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    want = {
        (r.p_partkey, r.p_size, r.p_retailprice)
        for r in relational.skyline_parts(spark, sf_dir).collect()
    }
    got = {
        (r.p_partkey, r.p_size, r.p_retailprice)
        for r in relational.skyline_routed_df(spark, part).collect()
    }
    assert got == want and got
    spark.catalog.clearCache()


def test_skyline_sorted_global_fallback_on_anticorrelated(spark):
    """The anti-correlated regime (r09 verdict #8): every point is on the
    frontier, the local prune shrinks nothing, and the broadcast path must
    NOT run. Force the fallback (broadcast_cap=0) on a mixed frame —
    anti-correlated diagonal + dominated noise + boundary-straddling ties —
    and check against the O(n^2) reference. n chosen so price groups span
    multiple range partitions AND multiple Arrow batches (batch-carry
    logic), via a tiny arrow batch size session conf."""
    from distributed_graph_database_simulation_spark.operators import relational

    rows = []
    # anti-correlated diagonal: price = i, size = i — paying more always
    # buys more, so no point dominates another: ALL n are on the frontier
    n = 400
    for i in range(n):
        rows.append((i, i, float(i)))
    # dominated noise under the diagonal (slightly pricier AND smaller)
    for i in range(5, n, 3):
        rows.append((10_000 + i, i - 5, float(i) + 0.5))
    # exact-duplicate tie on the frontier (both copies must survive)
    rows.append((20_000, 7, 7.0))
    # a same-price loser (smaller size at an existing price must drop)
    rows.append((20_001, 3, 7.0))

    def dominated(a):
        return any(
            b[2] <= a[2] and b[1] >= a[1] and (b[2] < a[2] or b[1] > a[1])
            for b in rows
        )

    want = {r for r in rows if not dominated(r)}
    df = spark.createDataFrame(
        rows, "p_partkey bigint, p_size int, p_retailprice double"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        got = {
            (r.p_partkey, r.p_size, r.p_retailprice)
            for r in relational.skyline_routed_df(spark, df, broadcast_cap=0).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want
    assert len(got) >= n  # the whole diagonal survived
    spark.catalog.clearCache()


def test_retention_cohorts_matches_python_reference(spark, sf_dir):
    from distributed_graph_database_simulation_spark.operators import relational
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    active = {
        (r.user_id, int(r.ts.timestamp() // relational.RETENTION_BUCKET_SECONDS))
        for r in ev
    }
    first = {}
    for u, d in active:
        first[u] = min(first.get(u, d), d)
    want: dict[tuple[int, int], int] = {}
    for u, d in active:
        key = (first[u], d - first[u])
        want[key] = want.get(key, 0) + 1
    got = {
        (r.cohort_day, r.offset_day): r.n_users
        for r in relational.retention_cohorts(spark, sf_dir).collect()
    }
    assert got == want
    assert got[max(got)[0], 0] >= 1  # every cohort has an offset-0 row


def test_mixture_balance_hits_quotas_and_is_deterministic(spark, sf_dir):
    """Quota arithmetic: lambda = min(cnt/w), per-group output = exactly
    floor(lambda*w); admission is the (scramble, doc_id) prefix per group
    and reruns admit the identical set."""
    from distributed_graph_database_simulation_spark.operators import pipeline
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    counts = {r.lang: r.cnt for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    w = pipeline.MIXTURE_WEIGHTS
    lam = min(counts[k] / w[k] for k in w)
    quotas = {k: int(lam * w[k]) for k in w}

    out = pipeline.pipe_mixture_balance(spark, sf_dir)
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    assert got == quotas

    # deterministic prefix: admitted set == quota lowest (scramble, doc_id)
    admitted = {r.doc_id for r in out.collect()}
    by_lang: dict[str, list] = {}
    for r in docs.collect():
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    want = set()
    for lang, ids in by_lang.items():
        order = sorted(ids, key=lambda d: ((d * 2654435761) % 1_000_003, d))
        want.update(order[: quotas.get(lang, 0)])
    assert admitted == want
    rerun = {r.doc_id for r in pipeline.pipe_mixture_balance(spark, sf_dir).collect()}
    assert rerun == admitted


def test_image_resize_matches_plain_python_gather(spark, sf_dir):
    """mm_image_resize vs an index-by-index Python loop (no numpy): the
    nearest-neighbor gather, channel order, and padding must agree."""
    from distributed_graph_database_simulation_spark.operators import multimodal as M
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").limit(50).collect()}
    T = M.RESIZE_T
    got = {
        r.media_id: (r.src_width, r.src_height, r.thumb_checksum)
        for r in M.mm_image_resize(spark, sf_dir).filter(F.col("media_id") < 50).collect()
    }
    assert set(got) == set(docs)
    for mid, text in docs.items():
        w, h = 4 + mid % 5, 4 + (mid * 3) % 5
        raw = text.encode("utf-8")[: w * h * 3].ljust(w * h * 3, b"\x00")
        check = 0
        k = 0
        for y in range(T):
            for x in range(T):
                for c in range(3):
                    sy, sx = (y * h) // T, (x * w) // T
                    check += k * raw[(sy * w + sx) * 3 + c]
                    k += 1
        assert got[mid] == (w, h, check), mid


def test_pq_adc_matches_plain_python_lloyd(spark, sf_dir):
    """sim_topk_pq vs an independent pure-Python PQ (no numpy): per-subspace
    Lloyd with the same seed/tie/update rules, ADC scoring, (dist, id)
    ranking. Catches subspace slicing, codebook drift, and table lookup
    errors the SQL oracle shares with the kernel only if both are right."""
    from distributed_graph_database_simulation_spark.operators import similarity as S
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    emb = {
        r.vec_id: [round((x + S.KMEANS_SHIFT) * S.KMEANS_SCALE) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .collect()
    }
    M, SD, K, IT = S.PQ_M, S.PQ_SUBDIM, S.PQ_K, S.PQ_ITERS

    def sub(v, s):
        return v[s * SD:(s + 1) * SD]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seeds = sorted(emb)[:K]
    cents = [{i: sub(emb[vid], s) for i, vid in enumerate(seeds)} for s in range(M)]
    for _ in range(IT - 1):
        new = []
        for s in range(M):
            assign = {}
            for vid, v in emb.items():
                best = min(cents[s].items(), key=lambda kv: (d2(sub(v, s), kv[1]), kv[0]))
                assign.setdefault(best[0], []).append(sub(v, s))
            new.append({
                cid: [sum(col) // len(vs) for col in zip(*vs)]
                for cid, vs in assign.items()
            })
        cents = new
    codes = {
        vid: [min(cents[s].items(), key=lambda kv: (d2(sub(v, s), kv[1]), kv[0]))[0]
              for s in range(M)]
        for vid, v in emb.items()
    }
    want = {}
    for qid in range(S.N_QUERIES):
        qv = emb[qid]
        scored = sorted(
            (sum(d2(sub(qv, s), cents[s][codes[vid][s]]) for s in range(M)), vid)
        for vid in emb if vid != qid)
        for rank, (dist, vid) in enumerate(scored[: S.TOP_K], 1):
            want[(qid, rank)] = (vid, dist)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist2)
        for r in S.sim_topk_pq(spark, sf_dir).collect()
    }
    assert got == want


def test_pq_recall_against_bruteforce(spark, sf_dir):
    """PQ is approximate; pin that its top-10 overlaps the exact cosine
    top-10 meaningfully (>= 30% average recall on this corpus) so a
    degenerate all-ties codebook can't silently pass the exactness test."""
    from distributed_graph_database_simulation_spark.operators import similarity as S

    exact = {}
    for r in S.sim_topk_bruteforce(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in S.sim_topk_pq(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_ivfpq_equals_python_ivf_candidates_with_pq_scores(spark, sf_dir):
    """sim_topk_ivfpq vs an independent pure-Python composition: full-vector
    Lloyd lists + 4-list probing for candidates, PQ Lloyd + ADC for scores,
    (score, id) ranking over the candidate set only."""
    from distributed_graph_database_simulation_spark.operators import similarity as S
    from distributed_graph_database_simulation_spark.sources.tables import load_table

    emb = {
        r.vec_id: [round((x + S.KMEANS_SHIFT) * S.KMEANS_SCALE) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def lloyd(vecs_by_id, k, iters, sub=None):
        def proj(v):
            return v if sub is None else v[sub[0]:sub[1]]
        seeds = sorted(vecs_by_id)[:k]
        cents = {i: proj(vecs_by_id[vid]) for i, vid in enumerate(seeds)}
        for _ in range(iters - 1):
            assign = {}
            for vid, v in vecs_by_id.items():
                best = min(cents.items(), key=lambda kv: (d2(proj(v), kv[1]), kv[0]))
                assign.setdefault(best[0], []).append(proj(v))
            cents = {cid: [sum(col) // len(vs) for col in zip(*vs)]
                     for cid, vs in assign.items()}
        return cents

    # IVF lists over full vectors
    ivf = lloyd(emb, S.IVF_LISTS, S.IVF_KMEANS_ITERS)
    member = {vid: min(ivf.items(), key=lambda kv: (d2(v, kv[1]), kv[0]))[0]
              for vid, v in emb.items()}
    # PQ codebooks per subspace
    M, SD = S.PQ_M, S.PQ_SUBDIM
    pq = [lloyd(emb, S.PQ_K, S.PQ_ITERS, sub=(s * SD, (s + 1) * SD)) for s in range(M)]
    codes = {
        vid: [min(pq[s].items(),
                  key=lambda kv: (d2(v[s * SD:(s + 1) * SD], kv[1]), kv[0]))[0]
              for s in range(M)]
        for vid, v in emb.items()
    }
    want = {}
    for qid in range(S.N_QUERIES):
        qv = emb[qid]
        probed = sorted(ivf.items(), key=lambda kv: (d2(qv, kv[1]), kv[0]))[: S.IVF_PROBES]
        lists = {cid for cid, _ in probed}
        scored = sorted(
            (sum(d2(qv[s * SD:(s + 1) * SD], pq[s][codes[vid][s]]) for s in range(M)), vid)
            for vid in emb if vid != qid and member[vid] in lists
        )
        for rank, (dist, vid) in enumerate(scored[: S.TOP_K], 1):
            want[(qid, rank)] = (vid, dist)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist2)
        for r in S.sim_topk_ivfpq(spark, sf_dir).collect()
    }
    assert got == want


def test_semdedup_matches_python_reference(spark, sf_dir):
    """SemDeDup vs an independent pure-Python pipeline: same integer Lloyd
    clustering, within-cluster unshifted cosine, farther-from-centroid
    loser rule. Exact match of (cluster, dist, kept) for every vector."""
    import math

    vecs = {
        r.vec_id: [round((x + similarity.KMEANS_SHIFT) * similarity.KMEANS_SCALE)
                   for x in r.e]
        for r in similarity._emb(spark, sf_dir).collect()
    }
    k, iters = 8, 3
    cents = {i: vecs[v] for i, v in enumerate(sorted(vecs)[:k])}
    assign = {}
    for _ in range(iters):
        for vid, q in vecs.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(q, c)), cid)
                for cid, c in cents.items()
            )
            assign[vid] = (best[1], best[0])
        new = {}
        for cid in cents:
            members = [vecs[v] for v, (c, _) in assign.items() if c == cid]
            new[cid] = (
                [sum(col) // len(members) for col in zip(*members)]
                if members else cents[cid]
            )
        cents = new
    unshift = int(similarity.KMEANS_SHIFT * similarity.KMEANS_SCALE)
    raw = {v: [x - unshift for x in q] for v, q in vecs.items()}
    norm = {v: math.sqrt(float(sum(x * x for x in r))) for v, r in raw.items()}
    losers = set()
    for a, (ca, da) in assign.items():
        for b, (cb, db) in assign.items():
            if a == b or ca != cb:
                continue
            if not (db < da or (db == da and b < a)):
                continue
            cos = float(sum(x * y for x, y in zip(raw[a], raw[b]))) / (
                norm[a] * norm[b]
            )
            if cos >= dedup.SEMDEDUP_T:
                losers.add(a)
    expected = {
        v: (c, d, 0 if v in losers else 1) for v, (c, d) in assign.items()
    }
    got = {
        r.vec_id: (r.cluster_id, r.dist_sq, r.kept)
        for r in dedup.dedup_semdedup(spark, sf_dir).collect()
    }
    assert got == expected
    assert 0 < len(losers) < len(vecs)  # non-vacuous: some, not all, dropped


def test_dataset_card_exact_counts(spark):
    """Hand-built corpus: duplicate docs counted per shard (every copy of
    a recurring text counts, in whichever shard it lives), token/char
    mass exact, share in ppm of the whole corpus."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        dataset_card_df,
    )

    rows = [
        # (doc_id, text, lang, source, n_chars)
        (0, "a b c", "en", "web", 5),
        (1, "a  b c ", "en", "web", 7),   # normalizes equal to doc 0
        (2, "a b c", "en", "books", 5),   # same text, other shard
        (3, "x y", "de", "web", 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    card = {
        (r.source, r.lang): r.asDict() for r in dataset_card_df(docs).collect()
    }
    web_en = card[("web", "en")]
    assert web_en["n_docs"] == 2
    assert web_en["n_dup_docs"] == 2        # both copies of the recurring text
    assert web_en["tokens_sum"] == 6
    assert web_en["chars_sum"] == 12
    assert web_en["avg_tokens_micro"] == 3_000_000
    assert web_en["share_ppm"] == 500_000   # 2 of 4 docs
    assert card[("books", "en")]["n_dup_docs"] == 1
    assert card[("web", "de")]["n_dup_docs"] == 0
    assert card[("web", "de")]["share_ppm"] == 250_000


def test_temperature_mix_rebalances_toward_tail(spark):
    """alpha=0.5 temperature semantics: the keep RATE of a rare group must
    exceed the keep rate of a common group (that is the whole point of
    temperature sampling), total kept ~= keep_ppm of the corpus, and
    membership is deterministic (two runs identical)."""
    from distributed_graph_database_simulation_spark.operators.pipeline import (
        temperature_mix_df,
    )

    rows = [(i, "big") for i in range(9000)] + [
        (10_000 + i, "small") for i in range(250)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    kept = temperature_mix_df(df, "lang", "doc_id").collect()
    by_lang = {}
    for r in kept:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    rate_big = by_lang.get("big", 0) / 9000
    rate_small = by_lang.get("small", 0) / 250
    assert rate_small > rate_big  # tail keeps a larger fraction
    # expected keep rates: t_g = keep * N * s_g / (S * n_g); exact-in-
    # expectation via the ppm hash, so allow sampling noise only
    import math

    s_big, s_small = math.isqrt(9000), math.isqrt(250)
    S, N = s_big + s_small, 9250
    exp_big = min(1.0, 0.5 * N * s_big / (S * 9000))
    exp_small = min(1.0, 0.5 * N * s_small / (S * 250))
    assert rate_big == pytest.approx(exp_big, rel=0.15)
    assert rate_small == pytest.approx(exp_small, rel=0.15)
    kept2 = temperature_mix_df(df, "lang", "doc_id").collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in kept2)
