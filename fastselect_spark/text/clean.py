"""Unicode text cleaning — NFC normalization, control-char strip,
whitespace collapse. The canonicalization step every dedup/fingerprint
stage should run first: visually-identical strings with different
codepoint sequences (é vs e+U+0301) otherwise hash to different buckets.

Spark has no built-in Unicode-normalize expression, so the kernel is an
Arrow-batched pandas UDF (Python ``unicodedata.normalize`` — the same
Unicode algorithm DuckDB's ``nfc_normalize`` implements, which is what
makes the cross-engine oracle possible). Fixed operation order, mirrored
exactly in the oracle SQL:

    1. NFC (or caller's form) normalize
    2. strip control chars [\\x00-\\x08\\x0b-\\x1f\\x7f] (keeps \\t \\n)
    3. collapse runs of [ \\t] to one space
    4. trim leading/trailing " \\t\\n\\r" (an explicit charset — Python's
       bare ``strip()`` also eats U+0085/U+00A0, which SQL TRIM does not)

Row-local projection: no shuffle at any scale. The pandas UDF is
constructed lazily inside the operator (module import must not require an
active Spark session — CLAUDE.md round-4)."""

from __future__ import annotations

import re
import unicodedata

import pandas as pd  # module scope: pandas_udf resolves stringified hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CONTROLS = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
_WS_RUNS = re.compile(r"[ \t]+")


def clean_text_kernel(s: str | None, form: str = "NFC") -> str | None:
    """Single-string reference kernel (shared by the UDF and tests)."""
    if s is None:
        return None
    s = unicodedata.normalize(form, s)
    s = _CONTROLS.sub("", s)
    s = _WS_RUNS.sub(" ", s)
    return s.strip(" \t\n\r")


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
) -> DataFrame:
    """Append ``out_col`` (default ``{text_col}_clean``) — the cleaned
    string per the fixed 4-step order above."""
    from pyspark.sql.functions import pandas_udf

    out_col = out_col or f"{text_col}_clean"

    @pandas_udf("string")
    def _clean(col: pd.Series) -> pd.Series:
        return col.map(lambda s: clean_text_kernel(s, form))

    c: Column = _clean(F.col(text_col))
    return df.withColumn(out_col, c)
