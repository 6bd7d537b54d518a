"""Text analysis operators for large-scale training-data pipelines
(graft-added per the task brief: language-ID, quality scoring, token
counting, document fingerprinting — each runnable over the ``documents``
table).

Everything is built-in Spark SQL expressions (JVM-side, whole-stage
codegen); no Python in the hot path. Each operator adds columns so they
compose into one projection over a single scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (public common-word lists); the
# heuristic scores languages by marker-token hits and picks the argmax.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

_BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def add_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish sub-token count (letters runs,
    digit runs, single punctuation — a cheap proxy for BPE vocab pressure).
    NULL text counts 0 tokens (null-propagating counts poison downstream
    aggregates/filters the same way a null quality score would)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    df = df.withColumn("n_ws_tokens", F.size(_tokens(c)))
    df = df.withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(c, F.lit(_BPE_ISH_TOKEN_RE), 0))
    )
    return df


# English stopword set for the quality-filter stopword ratio (classic
# Gopher/C4-style pretraining heuristic: natural prose has a stable
# fraction of function words; boilerplate and code do not).
_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
]


def add_stopword_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``stopword_ratio`` = fraction of (lowercased, whitespace) tokens that
    are English stopwords — pure JVM higher-order ``filter``, no UDF."""
    toks = _tokens(F.lower(F.col(text_col)))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return df.withColumn(
        "stopword_ratio", n_stop / F.greatest(F.size(toks), F.lit(1))
    )


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0, 1] from length, punctuation ratio,
    mean word length, and alpha ratio (classic pretraining-corpus filters).
    NULL text scores 0.0 — a null-propagating score silently drops the row
    from every downstream threshold filter AND poisons aggregates."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    n_tok = F.size(_tokens(c))
    df = (
        df.withColumn("q_len", F.least(n_chars / F.lit(500.0), F.lit(1.0)))
        .withColumn("q_alpha_ratio", n_alpha / F.greatest(n_chars, F.lit(1)))
        .withColumn("q_punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "q_mean_word_len",
            n_chars / F.greatest(n_tok, F.lit(1)),
        )
    )
    quality = (
        0.4 * F.col("q_len")
        + 0.4 * F.col("q_alpha_ratio")
        + 0.2 * (1.0 - F.least(F.col("q_punct_ratio") * 5.0, F.lit(1.0)))
    )
    return df.withColumn("quality_score", quality)


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: per language, count marker hits among the
    document's tokens; predict the argmax, 'und' when no marker hits.

    Pure array expressions (arrays_intersect over a token set) — no UDF."""
    toks = F.array_distinct(_tokens(F.lower(F.col(text_col))))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"__lang_{lang}"
        )
        for lang, words in _LANG_MARKERS.items()
    ]
    df = df.select("*", *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"__lang_{l}") for l in langs])
    pred = F.lit("und")
    # first language reaching the max (deterministic priority order)
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"__lang_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    df = df.withColumn("lang_pred", pred)
    return df.drop(*[f"__lang_{l}" for l in langs])


def add_fingerprint(
    df: DataFrame, text_col: str = "text", with_rolling: bool = True
) -> DataFrame:
    """Two document fingerprints:
    - ``fp_exact``: md5 of whitespace-normalized lowercase text (exact-dup key);
    - ``fp_rolling``: 64-bit polynomial rolling hash over tokens (order-
      sensitive content fingerprint), computed with JVM-side ``aggregate``
      over the token array — no Python. Opt out with ``with_rolling=False``
      when only the exact key is needed: Catalyst higher-order aggregates
      are interpreted PER TOKEN, and computing-then-dropping the rolling
      hash was 7x the cost of the whole exact-dedup stage (measured
      3.45 s vs 0.49 s at 10k docs).
    """
    c = F.col(text_col)
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    df = df.withColumn("fp_exact", F.md5(norm))
    if not with_rolling:
        return df
    toks = F.split(norm, " ")
    # polynomial rolling hash in the Mersenne field 2^31-1 (modular steps
    # keep intermediates < 2^52, overflow-safe under ANSI mode)
    mod = F.lit(2147483647).cast("long")
    df = df.withColumn(
        "fp_rolling",
        F.aggregate(
            toks,
            F.lit(5381).cast("long"),
            lambda acc, t: F.pmod(
                acc * F.lit(1000003).cast("long") + F.pmod(F.xxhash64(t), mod), mod
            ),
        ),
    )
    return df
