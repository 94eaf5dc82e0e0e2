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


# C1 accent strip (processor.py:73-83,120-129 NFD + drop combining
# marks) as a codegen-friendly translate over the pt-BR accent set —
# no Python UDF, matches DuckDB's strip_accents on these characters.
_ACCENTED = "áàâãäåéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
_PLAIN = "aaaaaaeeeeiiiiooooouuuucnyAAAAAAEEEEIIIIOOOOOUUUUCNY"


def strip_accents(c: Column | str) -> Column:
    """Remove pt-BR diacritics: 'Composição' -> 'Composicao' (C1)."""
    return F.translate(_col(c), _ACCENTED, _PLAIN)


def normalize_label(c: Column | str) -> Column:
    """Reference header/text normalization (C1+C2+C3 composed).

    accent-strip -> upper -> whitespace runs to '_' -> drop anything
    outside [A-Z0-9_] (processor.py:116-132).
    """
    up = F.upper(strip_accents(c))
    squashed = F.regexp_replace(up, r"\s+", "_")
    return F.regexp_replace(squashed, r"[^A-Z0-9_]", "")
