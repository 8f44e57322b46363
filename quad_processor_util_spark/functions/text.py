"""Text-analysis functions for the training-data pipeline — all pure
Catalyst expressions (JVM-side, whole-stage codegen; no Python).

These extend the reference's string toolkit (utils/StringUtils.scala,
utils/WikiUtil.scala) with the operations a 100 TB document pipeline needs:
token counting, quality scoring, language-ID heuristics, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a BPE-ish token: word chars, or a single non-space symbol
_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def token_count(col: Column) -> Column:
    """Whitespace token count (cheap, codegen'd)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Regex-token count approximating a BPE pre-tokenizer."""
    return F.size(F.regexp_extract_all(col, F.lit(_TOKEN_RE), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    """punctuation chars / total chars (quality signal)."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, F.round(p / n, 6)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)) -> Column:
    """share of tokens that are stopwords (English heuristic)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, F.round(hits / n, 6)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality: length band + low punct + some stopwords —
    a deterministic stand-in for a model-based scorer."""
    n = F.length(col)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(0.5)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) > 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    return F.round(len_ok + punct_ok + stop_ok, 6)


def lang_id_heuristic(col: Column) -> Column:
    """Tiny n-gram/stopword language guess over {en, de, es, fr, other}.
    Deterministic, expression-only; a real pipeline would plug a model in
    via mapInPandas with the same column contract."""
    low = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    has = lambda *ws: sum(  # noqa: E731
        (F.when(low.contains(f" {w} "), 1).otherwise(0) for w in ws), F.lit(0)
    )
    en = has("the", "and", "of", "is")
    de = has("der", "die", "das", "und")
    es = has("el", "la", "los", "que")
    fr = has("le", "les", "des", "est")
    mx = F.greatest(en, de, es, fr)
    return (
        F.when(mx == 0, "other")
        .when(en == mx, "en")
        .when(de == mx, "de")
        .when(es == mx, "es")
        .otherwise("fr")
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace/case-normalized text
    (rolling-hash analog; md5 matches the reference's md5sum,
    utils/StringUtils.scala:261-269, and DuckDB's md5 for oracle checks)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))
