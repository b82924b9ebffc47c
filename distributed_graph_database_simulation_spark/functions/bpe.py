"""Deterministic BPE (byte-pair-encoding) subword tokenizer.

The most-used LLM-pipeline primitive the regex token counter
(``text_analysis.text_token_count``) is not: a real subword segmentation
whose token counts drive packing and budget admission. Public-knowledge
algorithm (Sennrich, Haddow & Birch 2016); the merge table below was
learned OFFLINE from the sf0.001 corpus by ``tools/learn_bpe.py`` (classic
pair-frequency BPE, lexicographic tie-break) and is CHECKED IN — the same
fixed table at every scale factor, which is what makes the encoder a pure
deterministic function with an exact cross-engine oracle.

Encoding semantics (identical in the Arrow kernel and the generated DuckDB
oracle, both built from ``BPE_MERGES``):

1. normalize: trim, collapse whitespace to single spaces, lowercase, strip
   everything outside ``[a-z0-9 ]`` — after which the two control glyphs
   below provably cannot occur in the text;
2. symbolize: append one trailing space, turn every space into the
   end-of-word marker ``#``, then prefix every character with the symbol
   separator ``|``  (word "the" becomes ``|t|h|e|#``);
3. merge: for each (a, b) in ``BPE_MERGES`` IN ORDER, replace every
   leftmost non-overlapping ``|a|b`` with ``|ab`` — plain string replace,
   which scans left-to-right non-overlapping identically in Python and
   DuckDB, and is word-local by construction (no merge's FIRST element
   ever contains ``#``, so a match can never span the end-of-word marker).

Token count = number of ``|`` in the final string; the token sequence is
its ``|``-split. Sequential-replace BPE is the original formulation
(merges applied in learned order, one full pass each) — O(len * n_merges)
per document, embarrassingly parallel, no shuffle: exactly the shape that
survives a 100 TB corpus.
"""

from __future__ import annotations

SEP = "|"
END_OF_WORD = "#"

# Learned by tools/learn_bpe.py from /root/testdata/sf0.001 (24 merges);
# regenerate with `python tools/learn_bpe.py <sf_dir> <n>` if the corpus
# generator ever changes.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("e", "#"),
    ("n", "#"),
    ("o", "r"),
    ("t", "#"),
    ("er", "#"),
    ("o", "w"),
    ("ow", "#"),
    ("l", "u"),
    ("i", "n"),
    ("y", "#"),
    ("a", "r"),
    ("p", "ar"),
    ("g", "#"),
    ("a", "s"),
    ("h", "#"),
    ("a", "#"),
    ("s", "t"),
    ("a", "t"),
    ("a", "n#"),
    ("c", "an#"),
    ("s", "can#"),
    ("c", "o"),
    ("co", "lu"),
]

# No merge may cross a word boundary: the replace chain is only word-local
# if no FIRST element carries the end-of-word marker (a second element may
# — 'n#' above — making the merged token word-final).
assert all(END_OF_WORD not in a for a, _ in BPE_MERGES)


def bpe_encode(text: str) -> list[str]:
    """Encode one document; returns its BPE token list. Pure Python, the
    executable specification — the Arrow kernel and the DuckDB oracle are
    both vectorizations of exactly this."""
    import re

    norm = re.sub(r"[^a-z0-9 ]", "", re.sub(r"\s+", " ", text.strip()).lower())
    if not norm:
        return []
    s = (norm + " ").replace(" ", END_OF_WORD)
    s = SEP + SEP.join(s)
    for a, b in BPE_MERGES:
        s = s.replace(f"{SEP}{a}{SEP}{b}", f"{SEP}{a}{b}")
    return s.split(SEP)[1:]


def bpe_oracle_expr(text_col: str = "text") -> str:
    """The DuckDB scalar expression computing the final symbol string for
    ``text_col`` — the same normalize/symbolize/merge chain as
    :func:`bpe_encode`, generated from the same table (nested replace()
    calls, innermost first)."""
    norm = (
        f"regexp_replace(lower(regexp_replace(trim({text_col}), "
        f"'\\s+', ' ', 'g')), '[^a-z0-9 ]', '', 'g')"
    )
    expr = (
        f"'{SEP}' || array_to_string(string_split("
        f"replace({norm} || ' ', ' ', '{END_OF_WORD}'), ''), '{SEP}')"
    )
    for a, b in BPE_MERGES:
        expr = f"replace({expr}, '{SEP}{a}{SEP}{b}', '{SEP}{a}{b}')"
    return expr
