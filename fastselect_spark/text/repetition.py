"""Gopher-style repetition statistics (Rae et al. 2021, Table A1) — the
repetitious-text quality signals that complement the C4-style keep-rule
chain (corpus/filtering.py): documents dominated by repeated lines or a
single recurring n-gram are boilerplate/spam and are filtered before
training.

Metrics per document (exact definitions, shared with the DuckDB oracle):

- ``n_lines`` / ``dup_line_frac`` — lines = raw text split on newline,
  whitespace-normalized+lowercased, empties dropped; dup fraction =
  occurrences beyond each line's first, over total lines.
- ``dup_word_frac`` — same rule over whitespace tokens of the normalized
  text.
- ``top2gram_char_frac`` / ``top3gram_char_frac`` — the most frequent
  overlapping word {2,3}-gram's ``count * len(gram) / len(norm_text)``
  (ties broken by the lexicographically smallest gram, so the statistic
  is deterministic); 0.0 when the doc has fewer than n tokens or no
  gram repeats (count-1 grams are not repetition).

Values are UNROUNDED float64 of exact integer ratios — cross-engine
consumers (the driver contract) round engine-side (F.round / SQL ROUND,
both half-away for positives), never in Python (round-half-even).

Shape: ONE Arrow pandas UDF computes every metric in a single pass
(integer Counter arithmetic — deterministic and transliterable to SQL).
The per-doc mode-n-gram could be written as explode + two keyed
aggregations, but that is two full exchanges of (doc, gram) rows for a
statistic each doc can compute locally; per-(row × gram) work is exactly
the regime where the Arrow kernel beats interpreted Catalyst lambdas
(the minhash-kernel lesson). No shuffle, fully scan-parallel.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_REP_SCHEMA = (
    "struct<n_lines:int, dup_line_frac:double, dup_word_frac:double, "
    "top2gram_char_frac:double, top3gram_char_frac:double>"
)


def _norm(t: str | None) -> str:
    return re.sub(r"\s+", " ", ("" if t is None else t).strip()).lower()


def _dup_frac(items: list[str]) -> float:
    if not items:
        return 0.0
    return (len(items) - len(set(items))) / len(items)


def _top_ngram_char_frac(toks: list[str], n: int, total_chars: int) -> float:
    if len(toks) < n or total_chars == 0:
        return 0.0
    grams = Counter(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
    # deterministic mode: max count, then lexicographically smallest gram
    best = min(grams.items(), key=lambda kv: (-kv[1], kv[0]))
    if best[1] < 2:
        # a gram seen once is not repetition — without this guard every
        # short document scores len(gram)/len(text) spuriously
        return 0.0
    return best[1] * len(best[0]) / total_chars


def _repetition_kernel(texts: pd.Series) -> pd.DataFrame:
    rows = []
    for t in texts:
        lines = [_norm(x) for x in ("" if t is None else t).split("\n")]
        lines = [x for x in lines if x]
        norm = _norm(t)
        toks = norm.split(" ") if norm else []
        rows.append(
            {
                "n_lines": len(lines),
                "dup_line_frac": _dup_frac(lines),
                "dup_word_frac": _dup_frac(toks),
                "top2gram_char_frac": _top_ngram_char_frac(toks, 2, len(norm)),
                "top3gram_char_frac": _top_ngram_char_frac(toks, 3, len(norm)),
            }
        )
    return pd.DataFrame(rows)


def add_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the five repetition columns (see module docstring). The ONE
    struct-returning kernel call is assigned to a column first and fields
    are projected from it, so the UDF evaluates once per row."""
    udf = pandas_udf(_repetition_kernel, _REP_SCHEMA)
    df = df.withColumn("__rep", udf(F.col(text_col)))
    return df.withColumns(
        {
            f: F.col("__rep")[f]
            for f in (
                "n_lines",
                "dup_line_frac",
                "dup_word_frac",
                "top2gram_char_frac",
                "top3gram_char_frac",
            )
        }
    ).drop("__rep")


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_word_frac: float = 0.63,
    max_top2gram_char_frac: float = 0.20,
    max_top3gram_char_frac: float = 0.18,
) -> DataFrame:
    """Keep documents under every repetition ceiling (defaults follow the
    Gopher paper's thresholds for duplicate lines and top-{2,3}-gram
    character fractions, with the word-level dup ceiling sized for
    whitespace tokenization). Scoring columns are kept so audits can see
    why a row survived."""
    scored = add_repetition_stats(df, text_col)
    return scored.where(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top2gram_char_frac") <= max_top2gram_char_frac)
        & (F.col("top3gram_char_frac") <= max_top3gram_char_frac)
    )
