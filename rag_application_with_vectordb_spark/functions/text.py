"""Text-analysis Column expressions for the LLM-data-pipeline surface.

The reference's scalar string surface is tiny (substring/trim/length/
lower/endsWith/concat — SURVEY.md §2.6); these extensions add what a
training-data pipeline needs: tokenization, shingling, fingerprinting,
quality scoring, language ID. Everything here is a pure Catalyst
expression — codegen'd, shuffle-free, and mirrored 1:1 in DuckDB oracle
SQL (see ``plans.textops`` / ``plans.dedup_queries``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "word_shingles",
    "fingerprint",
    "hex13_to_long",
    "STOPWORDS_EN",
]

#: English stopword sample used by the language-ID heuristic and the
#: quality score's stopword-ratio feature.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization — ``split(trim(text), '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (set semantics, for Jaccard/MinHash).

    Documents with fewer than ``n`` tokens yield an empty set.

    Built from ``element_at`` + ``concat`` rather than ``slice`` +
    ``concat_ws``: slice allocates a sub-array per position (O(n) each),
    which measured ~2.7× slower across a corpus; element_at is O(1) and
    produces the identical string (whitespace tokens are never null).
    """
    w = tokens(text)

    def gram(i: Column) -> Column:
        parts: list[Column] = []
        for t in range(n):
            if t:
                parts.append(F.lit(" "))
            parts.append(F.element_at(w, i + t))
        return F.concat(*parts)

    grams = F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1)), gram)
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Identical hex in DuckDB → exact-dedup keys are oracle-checkable."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def hex13_to_long(hex_col: Column) -> Column:
    """First 13 hex chars → integer < 2^52 (fp64-exact, so the DuckDB
    oracle can reproduce it without a conv() builtin)."""
    return F.conv(F.substring(hex_col, 1, 13), 16, 10).cast("long")


#: PII patterns shared by the Spark and DuckDB sides — kept to syntax
#: that Java regex and RE2 interpret identically (no lookaround, no
#: backreferences, explicit character classes only).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def redact_pii(text: Column) -> Column:
    """Training-data PII scrub: replace emails, dashed phone numbers, and
    IPv4 literals with typed placeholders. Email first — its domain part
    could otherwise be chewed up by the IP pattern. Pure per-row
    expressions (JVM regex, no UDF) — parallelizes with the scan."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def hash_split(key: Column, train_permille: int = 900, seed: str = "split42") -> Column:
    """Deterministic train/held-out assignment by keyed hash — the
    reproducible-sampling primitive a training pipeline needs (random()
    splits are neither reproducible nor partitioning-stable). The first
    13 md5 hex chars give a uniform integer < 2^52; bucket by ‰. Same
    expression in DuckDB → the split itself is oracle-checkable."""
    bucket = hex13_to_long(F.md5(F.concat(F.lit(seed + "|"), key.cast("string")))) % 1000
    return F.when(bucket < int(train_permille), F.lit("train")).otherwise(F.lit("heldout"))
