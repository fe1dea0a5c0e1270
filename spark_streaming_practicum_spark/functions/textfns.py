"""Text-processing column expressions (tokenize, shingles, fingerprints).

All JVM-side built-ins; used by the text-analysis and dedup operator
families. Tokenization is whitespace-regex based so Spark and the DuckDB
oracle (``regexp_split_to_array``/``string_split``) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword list for the language-ID heuristic. Keep in sync
# with the SQL literal in operators/text.py.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for", "with",
)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents.text is single-space separated)."""
    return F.split(text, r"\s+")


def shingles(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles: space-joined windows of ``n`` consecutive words.

    Empty array when the document has fewer than ``n`` words (guards
    Spark's descending-sequence behavior for start > stop).

    PERF CONTRACT: pass ``words`` as a PROJECTED COLUMN (``F.col``),
    never an inline ``split``/``tokens`` expression. The lambda slices
    ``words`` once per shingle position, and Catalyst does not CSE
    subexpressions across higher-order-function lambda boundaries — an
    inlined split is re-evaluated per position, turning the per-doc
    cost from O(len) into O(len^2). Measured at the 20x probe lake:
    ~20x wall-clock difference on the bigram explode (round 5).
    """
    count = F.size(words) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def poly_hash(text: Column | str, base: int = 131, mod: int = 1_000_000_007) -> Column:
    """Deterministic polynomial rolling hash over characters (BIGINT-safe:
    acc < mod, acc*base + 127 << 2^63). Matches DuckDB ``list_reduce`` of
    the same recurrence, enabling an SQL oracle for fingerprinting."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )
