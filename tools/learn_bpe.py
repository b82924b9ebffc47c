#!/usr/bin/env python3
"""Learn the checked-in BPE merge table (functions/bpe_merges.py).

Classic byte-pair-encoding learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"): start from
each word as its character sequence plus an end-of-word marker, repeatedly
merge the most frequent adjacent symbol pair (frequency weighted by word
count; ties broken by the lexicographically smallest pair, so the table is
bit-deterministic), for N_MERGES rounds. Pair counts are maintained
INCREMENTALLY (only words containing the merged pair are re-scanned), so a
1k+ merge table over a ~16k-word corpus learns in seconds, not hours.

The training corpus is every text-bearing column in the testdata (documents
text plus part/customer/supplier/nation names, market segments, order
priorities, event types and props) — a tokenizer is trained once on a broad
corpus and applied everywhere, and the documents table alone has only ~31
distinct words, which saturates at ~200 merges. Words are normalized with
the ENCODER'S EXACT normalization (functions/bpe.py: drop everything
outside [a-zA-Z0-9 + ASCII whitespace], lowercase, collapse ASCII
whitespace, trim) so the learned symbols are exactly the encoder's input
alphabet — no dead merge slots, and the end-of-word marker '#' provably
cannot appear inside any symbol (asserted).

Output is written as ``distributed_graph_database_simulation_spark/functions/bpe_merges.py``:
``BPE_MERGES`` (the learned table) and ``DOC_VOCAB`` (the union of the
documents tables' normalized vocabulary across the shipped scale factors —
the golden word list the generated DuckDB oracle joins against). The SAME
fixed table at every scale factor is what makes the encoder a pure
deterministic operator with an exact cross-engine oracle.

Usage: python tools/learn_bpe.py [testdata_root] [n_merges] [--stdout]
"""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict

N_MERGES_DEFAULT = 1024
END_OF_WORD = "#"
TRAIN_SF = "sf0.1"
DOC_VOCAB_SFS = ("sf0.001", "sf0.01", "sf0.1")

# Encoder-identical normalization (keep ASCII alnum + ASCII whitespace,
# lowercase, collapse whitespace, trim) expressed for DuckDB — the same
# chain functions/bpe.py runs in Python/pandas and emits for the oracle.
_NORM_SQL = (
    "trim(regexp_replace(lower(regexp_replace(COALESCE({col}, ''), "
    "'[^a-zA-Z0-9 \\t\\n\\r\\f\\v]', '', 'g')), "
    "'[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')"
)

# (table, expression) pairs forming the training corpus.
_CORPUS_COLS = [
    ("documents", "text"),
    ("part", "p_name || ' ' || p_type || ' ' || p_brand"),
    ("customer", "c_name || ' ' || c_mktsegment"),
    ("supplier", "s_name"),
    ("nation", "n_name"),
    ("region", "r_name"),
    ("orders", "o_orderpriority"),
    ("events", "event_type || ' ' || props"),
]


def _words_sql(sf_dir: str, table: str, expr: str) -> str:
    norm = _NORM_SQL.format(col=f"({expr})")
    return (
        f"SELECT unnest(string_split({norm}, ' ')) AS w "
        f"FROM read_parquet('{sf_dir}/{table}.parquet')"
    )


def word_freqs(sf_dir: str) -> Counter:
    import duckdb

    union = " UNION ALL ".join(_words_sql(sf_dir, t, e) for t, e in _CORPUS_COLS)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT w, count(*) AS n FROM ({union}) WHERE w <> '' GROUP BY 1"
    ).fetchall()
    return Counter(dict(rows))


def doc_vocab(testdata_root: str) -> list[str]:
    """Union of the documents tables' normalized vocabulary across the
    shipped scale factors — the golden word list for the oracle."""
    import duckdb

    con = duckdb.connect()
    vocab: set[str] = set()
    for sf in DOC_VOCAB_SFS:
        path = f"{testdata_root}/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        norm = _NORM_SQL.format(col="text")
        rows = con.execute(
            f"SELECT DISTINCT unnest(string_split({norm}, ' ')) AS w "
            f"FROM read_parquet('{path}')"
        ).fetchall()
        vocab.update(w for (w,) in rows if w)
    return sorted(vocab)


def learn_merges(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    # word -> current symbol sequence (chars + end-of-word marker). The
    # marker is appended as its own symbol; normalized words are [a-z0-9]+
    # so '#' (and the kernel's '|' separator) can never occur inside them.
    assert all(END_OF_WORD not in w and "|" not in w for w in freqs)
    seqs: dict[str, list[str]] = {w: [*w, END_OF_WORD] for w in freqs}
    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    for w, seq in seqs.items():
        f = freqs[w]
        for p in zip(seq, seq[1:]):
            pair_counts[p] += f
            where[p].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or (-c, p) < (-pair_counts[best], best):
                best = p
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w in list(where[best]):
            seq = seqs[w]
            f = freqs[w]
            for p in zip(seq, seq[1:]):
                pair_counts[p] -= f
                where[p].discard(w)
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += f
                where[p].add(w)
        # drop dead pairs so the argmax scan stays proportional to live pairs
        if len(pair_counts) > 4 * sum(1 for c in pair_counts.values() if c > 0):
            for p in [p for p, c in pair_counts.items() if c <= 0]:
                del pair_counts[p]
                where.pop(p, None)

    # word-locality invariant: a symbol containing '#' is word-final (no
    # successor within a word), so it can never be a pair's FIRST element.
    assert all(END_OF_WORD not in a for a, _ in merges)
    return merges


def render(merges: list[tuple[str, str]], vocab: list[str], argv: list[str]) -> str:
    lines = [
        '"""GENERATED by tools/learn_bpe.py — do not edit by hand.',
        "",
        f"Command: python tools/learn_bpe.py {' '.join(argv)}",
        f"Merges: {len(merges)} (classic BPE, frequency-then-lexicographic",
        "tie-break, learned from the multi-table testdata corpus — see the",
        'tool docstring). DOC_VOCAB: the documents tables\' normalized',
        "vocabulary union across shipped scale factors, the golden word",
        'list the generated DuckDB oracle joins against."""',
        "",
        "BPE_MERGES: list[tuple[str, str]] = [",
    ]
    lines += [f"    ({a!r}, {b!r})," for a, b in merges]
    lines += ["]", "", "DOC_VOCAB: list[str] = ["]
    lines += [f"    {w!r}," for w in vocab]
    lines += ["]", ""]
    return "\n".join(lines)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--stdout"]
    to_stdout = "--stdout" in sys.argv[1:]
    root = args[0] if len(args) > 0 else "/root/testdata"
    n = int(args[1]) if len(args) > 1 else N_MERGES_DEFAULT
    freqs = word_freqs(f"{root}/{TRAIN_SF}")
    merges = learn_merges(freqs, n)
    vocab = doc_vocab(root)
    text = render(merges, vocab, sys.argv[1:])
    if to_stdout:
        print(text)
        return 0
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "distributed_graph_database_simulation_spark",
        "functions",
        "bpe_merges.py",
    )
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out}: {len(merges)} merges, {len(vocab)} doc-vocab words")
    return 0


if __name__ == "__main__":
    sys.exit(main())
