"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.  All pure JVM expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "was"]

# tiny per-language marker sets for the n-gram/charclass heuristic
_LANG_MARKERS = {
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "las", "una", "que"],
}


# BPE-ish pre-tokenizer (GPT-2 style, simplified to be Java+RE2 safe):
# contractions, letter runs, digit runs, punctuation runs, whitespace runs
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, distinct_tokens, avg_token_len,
    n_tokens_bpe).  Whitespace tokenization for the word stats; the
    BPE-ish count uses a GPT-2-style pre-tokenizer regex (JVM
    regexp_count — no Python)."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    nonspace = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("distinct_tokens"),
        F.round(nonspace / n_tokens, 6).alias("avg_token_len"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
         .alias("n_tokens_bpe"))


def quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, length_score, diversity, stopword_ratio, quality_score) —
    simple composable heuristics for corpus filtering."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    length_score = F.least(F.length(F.col(text_col)) / F.lit(500.0),
                           F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n
    stop_ratio = n_stop / n
    score = F.round(0.5 * length_score + 0.4 * diversity + 0.1 * stop_ratio, 6)
    return df.select(
        F.col(id_col),
        F.round(length_score, 6).alias("length_score"),
        F.round(diversity, 6).alias("diversity"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, predicted_lang) — marker-word / charclass heuristic:
    CJK chars → zh, Cyrillic → ru, kana → ja, else best marker-word hit,
    default en."""
    toks = F.split(F.lower(F.col(text_col)), " ")

    def _is_marker(markers):
        arr = F.array(*[F.lit(w) for w in markers])
        return lambda t: F.array_contains(arr, t)

    marker_hits = {
        lang: F.size(F.filter(toks, _is_marker(markers)))
        for lang, markers in _LANG_MARKERS.items()}
    pred = F.lit("en")
    best = F.lit(0)
    for lang, hits in marker_hits.items():
        pred = F.when(hits > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, hits)
    pred = (F.when(F.col(text_col).rlike("[\\u4e00-\\u9fff]"), "zh")
             .when(F.col(text_col).rlike("[\\u3040-\\u30ff]"), "ja")
             .when(F.col(text_col).rlike("[\\u0400-\\u04ff]"), "ru")
             .otherwise(pred))
    return df.select(F.col(id_col), pred.alias("predicted_lang"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — 16-hex-char digest of case-folded,
    whitespace-normalized text: stable under trivial reformatting."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.select(F.col(id_col),
                     F.substring(F.md5(norm), 1, 16).alias("fingerprint"))
