"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Estimate how target-like each raw document is from hashed n-gram bag
distributions: featurize every doc into occurrence counts over
``n_buckets`` hashed word-k-gram buckets, fit multinomial bucket
distributions for the TARGET corpus (the small high-quality set you want
more of) and the RAW pool, and score each raw doc with the
log-likelihood ratio

    log w(x) = sum over x's n-gram occurrences of
               log p_target(bucket) - log p_raw(bucket)

Selection is then a rank/threshold on ``logw`` (importance resampling in
the paper; a deterministic top-fraction here — see
:func:`dsir_select_top`).

Scale shape (the 100 TB path):
- Each distribution fit is ONE ``mapInPandas`` scan accumulating a
  length-``n_buckets`` int64 count vector, merged by the same tree
  reduction the selectors use (selection/_agg.py) — no shuffle keyed by
  data, driver ingress is ``fanin`` vectors.
- Scoring is ONE row-local scan with the (n_buckets,) log-ratio array
  broadcast — zero shuffles; the alternative explode → join → re-group
  plan would shuffle every n-gram occurrence twice.
- Tokenization + bucketing reuse the portable 60-bit md5 family
  (CLAUDE.md): bit-identical in Python, Spark SQL, and DuckDB, so the
  gate recomputes distributions AND scores end-to-end in SQL.

The reference engine has no corpus operators; this extends the repo's
training-data family (SURVEY.md §2) with the published method.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.selection._agg import tree_reduce_ndarrays


def _doc_buckets(text: str | None, k: int, n_buckets: int) -> np.ndarray:
    """Hashed bucket per n-gram OCCURRENCE (not distinct — these feed a
    frequency distribution). Tokenization matches dedup/minhash.py
    (_shingles): lowercase, whitespace-normalized, space-joined k-grams,
    whole-text fallback below k tokens. Bucket = 60-bit md5 prefix mod
    n_buckets — the cross-engine hash family."""
    norm = re.sub(r"\s+", " ", ("" if text is None else text).strip()).lower()
    toks = norm.split(" ")
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [norm]
    return np.array(
        [
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % n_buckets
            for g in grams
        ],
        dtype=np.int64,
    )


def hashed_ngram_distribution(
    df: DataFrame,
    text_col: str = "text",
    shingle_k: int = 2,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> np.ndarray:
    """Add-``smoothing`` multinomial over hashed n-gram buckets:
    (counts + a) / (total + a * n_buckets), as a driver-side (n_buckets,)
    float64 array. One tree-reduced scan; exact integer counts, so the
    result is partition-layout invariant."""

    def partial(batches: Iterator[pd.DataFrame]) -> dict[str, np.ndarray]:
        cnt = np.zeros(n_buckets, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            b = np.concatenate(
                [_doc_buckets(t, shingle_k, n_buckets) for t in pdf[text_col]]
            )
            cnt += np.bincount(b, minlength=n_buckets)
        return {"cnt": cnt}

    cnt = tree_reduce_ndarrays(df.select(text_col), partial)["cnt"]
    return (cnt + smoothing) / (cnt.sum() + smoothing * n_buckets)


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-raw-doc importance log-weight ``(id_col, logw)``.

    Two distribution scans (target, raw) + one broadcast scoring scan —
    no shuffle anywhere; the output is narrow. ``logw`` is unrounded
    float64 (round engine-side in contract queries, CLAUDE.md)."""
    p_t = hashed_ngram_distribution(target, text_col, shingle_k, n_buckets, smoothing)
    p_s = hashed_ngram_distribution(raw, text_col, shingle_k, n_buckets, smoothing)
    log_ratio = np.log(p_t) - np.log(p_s)
    bc = raw.sparkSession.sparkContext.broadcast(log_ratio)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lr = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            logw = [
                float(lr[_doc_buckets(t, shingle_k, n_buckets)].sum())
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "logw": logw})

    return raw.select(id_col, text_col).mapInPandas(
        score, schema=f"`{id_col}` long, logw double"
    )


_HIST_BUCKETS = 4096


def dsir_select_top(
    raw: DataFrame,
    target: DataFrame,
    fraction: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Deterministic exact top-``fraction`` of ``raw`` by DSIR log-weight
    (``logw`` DESC, ``id_col`` tie-break) — the resampling step collapsed
    to its mode. Returns the surviving raw rows (bare-id semi-join; text
    never crosses any selection shuffle).

    A global ``row_number`` Window (no partition key) would funnel the
    whole corpus through ONE task, and ``orderBy().limit()`` feeding
    further work plans the same GlobalLimit funnel (round-3/4 findings).
    Instead: histogram ``logw`` into ``_HIST_BUCKETS`` value ranges (one
    agg scan, 4096-row driver ingress), find the boundary bucket that
    crosses ``n_keep`` cumulatively from the top, keep every row strictly
    above it row-locally, and rank ONLY the boundary bucket's rows
    (~n/4096 of the corpus) for the remainder. Exact: equal values land
    in the same bucket, so above/boundary/below is a total-order split."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    w = dsir_logweights(raw, target, text_col, id_col, **kwargs).persist()
    try:
        n_total = w.count()
        n_keep = int(round(n_total * fraction))
        if n_keep >= n_total:
            return raw
        bounds = w.agg(
            F.min("logw").alias("lo"), F.max("logw").alias("hi")
        ).first()
        lo, hi = float(bounds["lo"]), float(bounds["hi"])
        if hi <= lo:
            # degenerate: all weights equal — id order decides everything;
            # the "boundary bucket" is the whole (narrow) frame
            bucket = F.lit(0)
        else:
            bucket = F.least(
                F.lit(_HIST_BUCKETS - 1),
                F.floor(
                    (F.col("logw") - F.lit(lo))
                    / F.lit(hi - lo)
                    * _HIST_BUCKETS
                ).cast("int"),
            )
        wb = w.withColumn("__b", bucket)
        hist = {
            r["__b"]: r["c"]
            for r in wb.groupBy("__b").agg(F.count("*").alias("c")).collect()
        }
        kept_above = 0
        boundary = 0
        for b in sorted(hist, reverse=True):
            if kept_above + hist[b] >= n_keep:
                boundary = b
                break
            kept_above += hist[b]
        remainder = n_keep - kept_above
        from pyspark.sql import Window

        # boundary rows only: a bounded single-partition rank (~n/4096)
        bw = Window.orderBy(F.col("logw").desc(), F.col(id_col).asc())
        boundary_ids = (
            wb.where(F.col("__b") == boundary)
            .withColumn("__r", F.row_number().over(bw))
            .where(F.col("__r") <= remainder)
            .select(id_col)
        )
        # materialize the narrow id set BEFORE releasing the weights cache:
        # the union consumes wb on both branches, and an unpersisted branch
        # point re-executes its whole plan per branch (round-3 lesson)
        keep_ids = (
            wb.where(F.col("__b") > boundary)
            .select(id_col)
            .unionByName(boundary_ids)
            .localCheckpoint(eager=True)
        )
        return raw.join(keep_ids, id_col, "left_semi")
    finally:
        w.unpersist()
