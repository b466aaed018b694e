"""Text analysis operators — all native Spark SQL expressions (JVM-side).

Each function returns Column expressions so they compose into any query and
stay inside whole-stage codegen; none of these need Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small multilingual stopword seed — enough for quality heuristics.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "der", "die", "das", "und", "le", "la", "les", "et", "el", "los", "y",
]

# character n-gram heuristics for a tiny deterministic lang-id:
# marker substrings → language (ordered; first hit wins).
LANG_MARKERS = [
    ("der ", "de"), ("die ", "de"), ("und ", "de"),
    ("le ", "fr"), ("les ", "fr"), ("été", "fr"),
    ("el ", "es"), ("los ", "es"), ("según", "es"),
    ("的", "zh"), ("是", "zh"),
    ("и ", "ru"), ("не ", "ru"),
    ("the ", "en"), ("and ", "en"),
]


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/null)."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries with
    a BPE-flavored regex (approximation of common tokenizer pre-splits)."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")),
            F.lit(r"([A-Za-z]+|\d+|[^\sA-Za-z\d])"),
            1,
        )
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty)."""
    total = F.length(F.coalesce(text, F.lit("")))
    punct = F.length(F.regexp_replace(F.coalesce(text, F.lit("")), r"[^\p{Punct}]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n <= 0, F.lit(0.0)).otherwise(sw / n)


def mean_word_length(text: Column) -> Column:
    toks = F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+")
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n <= 0, F.lit(0.0)).otherwise(total / n)


def quality_score(text: Column) -> Column:
    """Composite document quality in [0,1]: length band + stopword presence
    + low punctuation noise (web-pipeline heuristic, Gopher-rule flavored)."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
    pr = punct_ratio(text)
    punct_ok = F.when(pr <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + sw_ok + punct_ok, 2)


def lang_id_ngram(text: Column) -> Column:
    """Deterministic n-gram-marker language guess (first marker hit wins;
    'und' = undetermined)."""
    lowered = F.lower(F.coalesce(text, F.lit("")))
    expr = None
    for marker, lang in LANG_MARKERS:
        cond = lowered.contains(marker)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint64(text: Column) -> Column:
    """Rolling-hash-style 64-bit document fingerprint: xxhash64 over the
    whitespace-normalized, lowercased text (stable across formatting noise)."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    return F.xxhash64(norm)


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis profile of a documents table."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id_ngram(t).alias("lang_guess"),
        fingerprint64(t).alias("fingerprint"),
    )
