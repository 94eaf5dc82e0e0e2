"""Text-analysis column expressions (LLM-pipeline extensions).

All built-in Column expressions — no Python UDFs — so they run inside
whole-stage codegen over the ``documents`` corpus. These extend the
reference's string normalization surface (SURVEY §2.9 C1-C3) with the
operators a training-data pipeline needs: tokenization, stopword /
quality stats, language-ID heuristics, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately disjoint stopword lists so the language vote is unambiguous.
EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "on", "for", "with", "that")
PT_STOPWORDS = ("de", "da", "do", "que", "em", "para", "com", "um", "uma", "os")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_ws(c: Column | str) -> Column:
    """Collapse whitespace runs and trim (canonical text form)."""
    return F.trim(F.regexp_replace(_col(c), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(normalize_ws(c), " ")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def stopword_hits(c: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens that are stopwords (per-token, not distinct)."""
    return F.size(F.filter(tokens(c), lambda t: t.isin(*stopwords)))


def punct_ratio(c: Column | str) -> Column:
    """Share of characters that are not alphanumeric/whitespace."""
    c = _col(c)
    stripped = F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")
    return F.length(stripped) / F.length(c)


def fingerprint(c: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the canonical form."""
    return F.md5(normalize_ws(c))
