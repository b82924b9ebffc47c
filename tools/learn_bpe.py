#!/usr/bin/env python3
"""Learn the checked-in BPE merge table (functions/bpe.py) from the corpus.

Classic byte-pair-encoding learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"): start from
each word as its character sequence plus an end-of-word marker, repeatedly
merge the most frequent adjacent symbol pair (frequency weighted by word
count; ties broken by the lexicographically smallest pair, so the table is
bit-deterministic), for N_MERGES rounds.

Run offline; the output table is committed as a literal in
``distributed_graph_database_simulation_spark/functions/bpe.py`` — the
SAME fixed table at every scale factor, which is what makes the encoder a
deterministic operator with an exact cross-engine oracle (the oracle is a
generated chain of ``replace()`` calls over the same table).

Usage: python tools/learn_bpe.py [sf_dir] [n_merges]
Prints the merges as a Python literal to paste into functions/bpe.py.
"""

from __future__ import annotations

import sys
from collections import Counter

N_MERGES_DEFAULT = 24
END_OF_WORD = "#"


def word_freqs(sf_dir: str) -> Counter:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w, count(*) AS n FROM (
          SELECT unnest(string_split(
            regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
          FROM read_parquet('{sf_dir}/documents.parquet')
        ) WHERE w <> '' GROUP BY 1
        """
    ).fetchall()
    return Counter(dict(rows))


def learn_merges(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    # word -> current symbol sequence (chars + end-of-word marker)
    seqs: dict[str, list[str]] = {
        w: list(w) + [END_OF_WORD] for w in freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            n = freqs[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        # max frequency; ties -> lexicographically smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        a, b = best
        ab = a + b
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_MERGES_DEFAULT
    freqs = word_freqs(sf_dir)
    merges = learn_merges(freqs, n)
    print("BPE_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
