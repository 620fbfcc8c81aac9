"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All
expressed with built-in JVM functions (regexp/aggregate) so they run
inside whole-stage codegen at 100 TB — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons (n-gram heuristic): the language
# with the most marker hits wins; ties break alphabetically.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "that"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "les", "des", "une", "est"],
    "de": ["der", "die", "und", "das", "ist"],
}

_PUNCT = r"[.,;:!?'\"()\[\]{}\-]"
_WORD_SPLIT = r"\s+"
# BPE-ish token regex: runs of letters, runs of digits, or single symbols
_BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def words(col: F.Column) -> F.Column:
    return F.split(F.trim(F.lower(col)), _WORD_SPLIT)


def lang_id(col: F.Column) -> F.Column:
    """Marker-word language scorer; 'und' when nothing matches."""
    ws = words(col)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS, reverse=True):  # alphabetic tie-break: earlier wins
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score = F.size(F.array_intersect(F.array_distinct(ws), markers))
        take = score >= F.greatest(best_score, F.lit(1))
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.greatest(score, best_score)
    return best


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality signals (the classic C4-style filters)."""
    c = F.col(text_col)
    ws = words(c)
    n_words = F.size(ws)
    n_chars = F.length(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT, ""))
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w_: F.array_contains(stop, w_)))
    return (
        df.withColumn("q_n_chars", n_chars)
        .withColumn("q_n_words", n_words)
        .withColumn("q_punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("q_stopword_ratio", F.round(n_stop / F.greatest(n_words, F.lit(1)), 6))
        .withColumn(
            "q_mean_word_len",
            F.round(
                F.aggregate(ws, F.lit(0).cast("long"), lambda a, w_: a + F.length(w_))
                / F.greatest(n_words, F.lit(1)),
                6,
            ),
        )
    )


def token_count_ws(col: F.Column) -> F.Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), _WORD_SPLIT))


def token_count_bpe(col: F.Column) -> F.Column:
    """BPE-ish token count: letter runs + digit runs + single symbols."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_TOKEN), 0))


def fingerprint(col: F.Column) -> F.Column:
    """Canonical document fingerprint: sha256 of the
    whitespace-normalized lowercased text (stable under reflow)."""
    canon = F.concat_ws(" ", F.split(F.trim(F.lower(col)), _WORD_SPLIT))
    return F.sha2(canon, 256)


def rolling_hashes(col: F.Column, window: int = 8) -> F.Column:
    """Array of per-window rolling hashes over the word sequence
    (winnowing-style fingerprint shingles)."""
    ws = words(col)
    n = F.size(ws)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    return F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i + 1, window))))
