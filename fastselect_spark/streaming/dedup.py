"""Streaming exact deduplication of continuously-arriving documents/turns.

The batch layer's exact dedup (dedup/exact.py) is a hash-groupBy; the
streaming counterpart keeps the set of seen content fingerprints as state
and emits each fingerprint's FIRST arrival — the shape of an ingest-time
dedup stage in a training-data pipeline (drop repeated crawls/boilerplate
before they ever land in the corpus).

Two variants:

- :func:`streaming_dedup` — ``dropDuplicates`` on the fingerprint: exact
  global dedup; state holds one row per distinct fingerprint FOREVER. The
  emitted fingerprint SET equals batch ``SELECT DISTINCT`` (oracle-exact);
  which physical duplicate row survives is arrival-order-dependent, so
  downstream consumers should key on the fingerprint, not the row.
- :func:`streaming_dedup_within_watermark` — ``dropDuplicatesWithinWatermark``:
  state bounded by the watermark delay — the 100 TB-sane variant when
  duplicates are known to cluster in time (re-crawls, retries); duplicates
  farther apart than the delay are NOT collapsed (documented trade-off).

The fingerprint is the SAME normalization as text/analysis.py
``add_fingerprint`` (md5 of whitespace-collapsed lowercase text), so batch
and streaming dedup agree on what "identical content" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_fingerprint(stream: DataFrame, text_col: str) -> DataFrame:
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return stream.withColumn("fp_exact", F.md5(norm))


def streaming_dedup(
    stream: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """First arrival per distinct content fingerprint (unbounded state —
    exact; the emitted fingerprint set is deterministic)."""
    return _with_fingerprint(stream, text_col).dropDuplicates(["fp_exact"])


def streaming_dedup_within_watermark(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermark-bounded dedup: duplicates within the delay are collapsed,
    state is evicted as the watermark advances."""
    fp = _with_fingerprint(stream, text_col)
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp_exact"]
    )
