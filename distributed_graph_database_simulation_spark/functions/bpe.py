"""Deterministic BPE (byte-pair-encoding) subword tokenizer.

The most-used LLM-pipeline primitive the regex token counter
(``text_analysis.text_token_count``) is not: a real subword segmentation
whose token counts drive packing and budget admission. Public-knowledge
algorithm (Sennrich, Haddow & Birch 2016); the merge table
(``bpe_merges.BPE_MERGES``, 1,024 merges) was learned OFFLINE from the
multi-table sf0.1 corpus by ``tools/learn_bpe.py`` and is CHECKED IN — the
same fixed table at every scale factor, which is what makes the encoder a
pure deterministic function with an exact cross-engine oracle.

Encoding semantics (identical in the Python spec, the Arrow kernels, and
the generated DuckDB oracle):

1. normalize — drop every character outside ``[a-zA-Z0-9]`` + ASCII
   whitespace, lowercase (the remainder is pure ASCII, so Python/pandas
   ``lower`` and DuckDB ``lower`` provably agree), collapse ASCII
   whitespace runs to single spaces, trim spaces. The character classes
   are spelled ``[ \\t\\n\\r\\f\\v]`` EXPLICITLY on both engines — never
   ``\\s``, whose Unicode-vs-RE2-ASCII semantics diverge (NBSP, etc.).
   Null text normalizes to ``''`` (empty token list), it never raises.
   After normalization the two control glyphs below cannot occur.
2. per word — symbols start as the word's characters plus the end-of-word
   marker ``#``; repeatedly merge the LOWEST-RANK adjacent pair present in
   the merge table (all leftmost non-overlapping occurrences per step)
   until no adjacent pair is in the table. This is the STANDARD BPE
   encoder (Sennrich's apply_bpe / GPT-2 shape) and is the normative
   specification here — kernel and oracle both derive from it. (It is NOT
   always equal to the r12 one-pass-per-merge replace chain: a later
   merge can recreate an earlier merge's pair via a duplicate-formation
   symbol, which lowest-rank-first re-merges and a sequential chain
   misses — the r13 semantics change, re-certified through the gate.)
   Word-local by construction — each word is encoded independently, so no
   merge can span a word boundary.
3. document tokens — concatenation of the per-word token lists in word
   order. The canonical symbol STRING (what ``enc_md5`` pins) prefixes
   every token with the separator ``|``: doc "the cat" with words
   encoding to ``[th, e#]`` / ``[c, at#]`` has symbol string
   ``|th|e#|c|at#``; the token count is the number of ``|``.

Cost shape: encoding is word-local with a process-wide cache keyed by the
(small, Zipf-distributed) word vocabulary — per batch it is O(#words) dict
lookups plus O(|new vocab| * wordlen^2) one-time encodes, INDEPENDENT of
the merge-table size per document. Embarrassingly parallel, no shuffle:
exactly the shape that survives a 100 TB corpus and a 32k-merge vocab.

The generated DuckDB oracle cannot run the merge loop, so it joins a
GOLDEN (word -> symbol-string) table (``bpe_enc_ctes``) produced by this
module's own executable spec over ``bpe_merges.DOC_VOCAB`` — the documents
tables' full normalized vocabulary across shipped scale factors. An
out-of-vocabulary word drops out of the oracle's reconstruction and
hash-mismatches LOUDLY (never silently passes).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .bpe_merges import BPE_MERGES, DOC_VOCAB

SEP = "|"
END_OF_WORD = "#"

# Word-locality invariant: no merge's FIRST element may carry the
# end-of-word marker (a second element may — making the token word-final),
# so per-word encoding loses nothing vs whole-string encoding.
assert all(END_OF_WORD not in a for a, _ in BPE_MERGES)

_RANKS: dict[tuple[str, str], int] = {p: i for i, p in enumerate(BPE_MERGES)}

# Explicit ASCII classes — NEVER \s (Unicode in Python, ASCII in RE2).
_DROP_RE = re.compile(r"[^a-zA-Z0-9 \t\n\r\f\v]")
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def bpe_normalize(text: str | None) -> str:
    """Normalize one document: keep ASCII alnum + ASCII whitespace,
    lowercase, collapse whitespace, trim. Null-safe."""
    return _WS_RE.sub(" ", _DROP_RE.sub("", text or "").lower()).strip(" ")


def bpe_normalize_series(texts):
    """The same normalization, vectorized over a pandas string Series —
    shared by every Arrow kernel so kernel and spec cannot drift."""
    return (
        texts.fillna("")
        .str.replace(r"[^a-zA-Z0-9 \t\n\r\f\v]", "", regex=True)
        .str.lower()
        .str.replace(r"[ \t\n\r\f\v]+", " ", regex=True)
        .str.strip(" ")
    )


def bpe_norm_sql(text_col: str) -> str:
    """The identical normalization as a DuckDB expression (RE2 reads the
    same explicit ASCII classes; the post-drop remainder is pure ASCII so
    lower() agrees with Python's)."""
    return (
        f"trim(regexp_replace(lower(regexp_replace(COALESCE({text_col}, ''), "
        f"'[^a-zA-Z0-9 \\t\\n\\r\\f\\v]', '', 'g')), "
        f"'[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')"
    )


@lru_cache(maxsize=None)
def bpe_encode_word(word: str) -> tuple[str, ...]:
    """Encode one normalized word ([a-z0-9]+): standard lowest-rank-first
    pair merging over (chars + end-of-word marker). Cached process-wide —
    the corpus vocabulary is small and Zipfian, so steady-state encoding
    is one dict lookup per word occurrence."""
    syms: list[str] = [*word, END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        best = None
        for pair in zip(syms, syms[1:]):
            r = _RANKS.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        a, b = best
        ab = a + b
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


def bpe_encode(text: str | None) -> list[str]:
    """Encode one document; returns its BPE token list. Pure Python, the
    executable specification — the Arrow kernels and the generated DuckDB
    golden table are both derived from exactly this."""
    norm = bpe_normalize(text)
    if not norm:
        return []
    out: list[str] = []
    for w in norm.split(" "):
        out.extend(bpe_encode_word(w))
    return out


def bpe_word_sym(word: str) -> str:
    """The canonical symbol string of one word: ``|``-prefixed token
    join (``the`` -> ``|th|e#``). Document symbol string = concatenation
    over its words."""
    return SEP + SEP.join(bpe_encode_word(word))


def bpe_enc_ctes(cols: str = "", table: str = "documents") -> str:
    """The DuckDB oracle's encoding stage: a CTE chain ending in
    ``enc(doc_id[, cols], norm, s)`` where ``s`` is the document's full
    BPE symbol string (``''`` for empty docs), reconstructed by joining a
    GOLDEN (word -> symbol-string) table generated from the executable
    spec over ``DOC_VOCAB``. Out-of-vocabulary words make ``string_agg``
    skip a chunk and the md5/count mismatch loudly.

    Embed as ``WITH {bpe_enc_ctes()}<rest of the query>`` — callers'
    downstream SQL reads ``enc`` exactly as the former replace-chain
    version did."""
    extra = "".join(f", {c.strip()}" for c in cols.split(",") if c.strip())
    golden = ", ".join(f"('{w}', '{bpe_word_sym(w)}')" for w in DOC_VOCAB)
    return f"""bpe_norm AS (
  SELECT doc_id{extra}, {bpe_norm_sql("text")} AS norm FROM {table}
),
bpe_golden(w, sym) AS (VALUES {golden}),
bpe_words AS (
  SELECT n.doc_id, u.i AS i, string_split(n.norm, ' ')[u.i] AS w
  FROM bpe_norm n,
       UNNEST(generate_series(1, len(string_split(n.norm, ' ')))) AS u(i)
  WHERE n.norm <> ''
),
bpe_agg AS (
  SELECT w.doc_id, string_agg(g.sym, '' ORDER BY w.i) AS s
  FROM bpe_words w LEFT JOIN bpe_golden g ON g.w = w.w
  GROUP BY w.doc_id
),
enc AS (
  SELECT n.doc_id{extra}, n.norm,
         CASE WHEN n.norm = '' THEN '' ELSE a.s END AS s
  FROM bpe_norm n LEFT JOIN bpe_agg a USING (doc_id)
)"""
