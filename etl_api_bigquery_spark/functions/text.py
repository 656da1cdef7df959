"""Text-analysis functions for a training-data pipeline, all columnar.

These extend the reference's quality-scoring idea (src/quality/checks.py:
null-rate / dup-rate / type-correctness -> QualityReport.score) to the
document-corpus operations a 100 TB text pipeline needs: token counting,
quality scoring, language ID, fingerprinting. Every function is a pure
Column expression (JVM, codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram-free language heuristic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace/punct tokenization (BPE-ish regex split), lowercase,
    empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^a-z0-9']+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space. ``try_divide``
    (NULL-on-zero, coalesced to 0.0) because Spark's ``when`` does not
    short-circuit — a plain ``/`` would throw under ANSI on empty text."""
    c = (F.col(col) if isinstance(col, str) else col)
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.coalesce(
        F.try_divide(F.length(stripped).cast("double"), F.length(c)),
        F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.coalesce(
        F.try_divide(hits.cast("double"), F.size(toks)), F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.coalesce(
        F.try_divide(total.cast("double"), F.size(toks)), F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: long enough, sane mean
    token length, moderate punctuation, some stopwords. Deterministic and
    SQL-expressible (used by the DuckDB oracle too)."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = F.when(F.length(c) >= 100, F.lit(1.0)).otherwise(F.length(c) / 100.0)
    mtl = mean_token_len(c)
    mtl_ok = F.when((mtl >= 3) & (mtl <= 10), F.lit(1.0)).otherwise(F.lit(0.4))
    punct_ok = F.when(punct_ratio(c) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.3))
    sw_ok = F.when(stopword_ratio(c) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + mtl_ok + punct_ok + sw_ok) / 4.0, 4)


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language heuristic: the language whose marker words hit
    the most tokens wins; 'und' (undetermined) when nothing hits."""
    toks = tokens(col)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, words in _LANG_MARKERS.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        cond = hits > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits).otherwise(best_hits)
    return best_lang


def fingerprint(col: Column | str) -> Column:
    """Normalized-content fingerprint: sha256 over lowercased,
    whitespace-collapsed text — the document analogue of the engine's per-row
    content invariant (BASELINE.json sha256 rule)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.sha2(norm, 256)


def content_sha256(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)
