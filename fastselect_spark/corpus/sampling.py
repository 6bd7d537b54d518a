"""Corpus-management operators for training-data pipelines: deterministic
sampling and per-source quota capping.

Why not ``df.sample()``/``rand()``: at corpus scale a sample must be
REPRODUCIBLE (rerun the pipeline, get the same corpus), STABLE under
repartitioning (rand() is seeded per partition — a different file split
changes the sample), and CONSISTENT across derived tables (the same doc
keeps/drops everywhere it appears). Hashing a stable key gives all three:
keep doc iff h(seed, key) mod M < fraction * M. The hash is the 60-bit
md5 prefix — the same cross-engine family the dedup/multimodal oracles
use, so the DuckDB gate recomputes the exact sample.

Scale notes: ``deterministic_sample`` and ``sample_by_source`` are pure
JVM row-local expressions — no shuffle, fully pushdown-friendly.
``cap_per_source`` ranks within source groups (one hash exchange on the
source key); rank-by-quality top-k is the standard dedup-then-balance
step (cap boilerplate-heavy sources). For pathologically hot sources,
pre-aggregate with AQE skew handling or raise the quota granularity
(e.g. cap per (source, month)) — the window itself is the same plan the
featurize stack already audits (single Exchange + WindowExec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# keep/drop resolution: 1e6 buckets => fractions are exact to 1e-6
_BUCKETS = 1_000_000


def _hash_bucket(key: Column, seed: int) -> Column:
    """Uniform bucket in [0, 1e6) from the 60-bit md5 prefix of
    '{seed}:{key}' — identical in DuckDB:
    CAST('0x'||substr(md5(seed||':'||key),1,15) AS BIGINT) % 1000000.

    NULL keys propagate (concat, not concat_ws): the bucket is NULL, every
    ``bucket < threshold`` keep-predicate is NULL, and the row is DROPPED —
    exactly what the documented DuckDB SQL does (md5(seed||':'||key) of a
    NULL key is NULL). concat_ws would instead hash every null-key row to
    the same '{seed}' bucket, an all-or-nothing keep AND a silent
    cross-engine divergence."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % _BUCKETS


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep each row iff hash(seed, key) lands in the first ``fraction`` of
    bucket space — a reproducible, repartition-stable Bernoulli sample.

    Samples at the same seed are NESTED: sample(f1) ⊆ sample(f2) whenever
    f1 <= f2 (the keep rule is a threshold on one shared hash), so a
    scaling ladder (1% -> 10% -> 100% experiments) trains on strict
    supersets — change the seed when independent samples are wanted."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thresh = int(round(fraction * _BUCKETS))
    return df.where(_hash_bucket(F.col(key_col), seed) < F.lit(thresh))


def sample_by_source(
    df: DataFrame,
    fractions: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-source sampling rates (corpus MIXING: up-/down-weight sources to
    a target distribution) — the deterministic equivalent of
    ``DataFrame.sampleBy``. Sources absent from ``fractions`` get
    ``default_fraction``."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for source {s!r} must be in [0, 1]")
    thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    for s, f in sorted(fractions.items()):
        thresh = F.when(
            F.col(source_col) == s, F.lit(int(round(f * _BUCKETS)))
        ).otherwise(thresh)
    return df.where(_hash_bucket(F.col(key_col), seed) < thresh)


def cap_per_source(
    df: DataFrame,
    quota: int,
    source_col: str = "source",
    order_by: list[Column] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``quota`` rows per source, preferring rows by
    ``order_by`` (default: the stable key ascending — callers typically
    pass a quality score descending). Output keeps a ``source_rank``
    column (1-based) so downstream stages can tighten the cap without
    re-ranking."""
    if quota < 1:
        raise ValueError("quota must be >= 1")
    order = list(order_by) if order_by else []
    # stable total order: always break ties by the key
    order.append(F.col(key_col).asc())
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        df.withColumn("source_rank", F.row_number().over(w))
        .where(F.col("source_rank") <= quota)
    )


def train_val_test_split(
    df: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') by thresholding the
    SAME deterministic key hash the samplers use — reproducible,
    repartition-stable, and consistent across derived tables (a doc lands
    in the same split everywhere it appears). Weights are normalized;
    bucket thresholds are exact to 1e-6 (the bucket resolution)."""
    total = float(sum(weights))
    if total <= 0 or any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative with a positive sum")
    t1 = int(round(weights[0] / total * _BUCKETS))
    t2 = t1 + int(round(weights[1] / total * _BUCKETS))
    b = _hash_bucket(F.col(key_col), seed)
    return df.withColumn(
        "split",
        F.when(b < t1, F.lit("train"))
        .when(b < t2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def rebalance_classes(
    df: DataFrame,
    label_col: str = "label",
    key_col: str = "doc_id",
    target_ratio: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministically downsample majority classes so each class's
    EXPECTED count is at most ``target_ratio`` x the minority class count
    — the standard class-rebalance step before training on skewed labels.

    One tiny groupBy(label) count (driver-closed), then the same
    shuffle-free hash-Bernoulli keep rule as :func:`deterministic_sample`
    with a per-class threshold — a row-local filter: no exchange, no
    per-class jobs, stable under repartitioning, and nested across
    ``target_ratio`` values at a fixed seed. Thresholds use plain
    truncation (``int(f * _BUCKETS)``, == FLOOR for positive f) so the
    DuckDB mirror is CAST(FLOOR(...) AS BIGINT) with identical IEEE
    arithmetic — no half-even/half-away rounding divergence.

    NULL labels propagate NULL thresholds and are dropped, matching
    `_hash_bucket`'s NULL-key rule."""
    if target_ratio <= 0:
        raise ValueError("target_ratio must be > 0")
    counts = sorted(
        (r[0], r[1])
        for r in df.groupBy(label_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    if not counts:
        raise ValueError("rebalance_classes: input DataFrame is empty")
    floor_cnt = min(c for _, c in counts)
    thresh = F.lit(None).cast("long")
    for lbl, cnt in counts:
        f = target_ratio * floor_cnt / cnt
        t = _BUCKETS if f >= 1.0 else int(f * _BUCKETS)
        thresh = F.when(F.col(label_col) == F.lit(lbl), F.lit(t)).otherwise(thresh)
    return df.where(_hash_bucket(F.col(key_col), seed) < thresh)


def source_mixture_report(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_tokens, doc_share, token_share) — the mixture
    planning table: how much of the corpus (by documents and by
    whitespace tokens) each source contributes. ONE groupBy(source) agg
    (map-side partials, output bounded by the source alphabet); shares
    divide by ordered-window totals over that tiny table (pinned
    summation order — integer counts make the quotients IEEE-identical
    cross-engine)."""
    from pyspark.sql import Window

    agg = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), r"\s+")).cast("long"))
        .cast("long")
        .alias("n_tokens"),
    )
    w = Window.orderBy(source_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        source_col,
        "n_docs",
        "n_tokens",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast("double"))
        .alias("doc_share"),
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w).cast("double")
        ).alias("token_share"),
    )


_TB_BUCKETS = 4096
_TB_WIDTH = (1 << 60) // _TB_BUCKETS  # 60-bit md5 hash range / buckets


def sample_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    cost_col: str | None = None,
) -> DataFrame:
    """Per-source TOKEN-budget sampling: keep a deterministic hash-ordered
    prefix of each source whose cumulative whitespace-token count reaches
    ``budget_tokens`` (a doc is kept while the tokens BEFORE it are under
    budget, so the budget overshoots by at most one document) — the
    mixture-building primitive ("N tokens per source"), by token mass
    rather than row count (cap_per_source). ``cost_col`` optionally names
    a precomputed per-doc token-count column (a real BPE tokenizer's
    counts) to use as the token mass instead of the whitespace proxy.

    Scale shape (the dsir_select_top histogram-threshold discipline — a
    per-source ``Window.orderBy`` would funnel each source through one
    task): the 60-bit hash is RANGE-bucketed (bucket = h // 2^48, so
    bucket-major order IS hash order); ONE (source, bucket) token-sum agg
    (tiny driver ingress) finds each source's boundary bucket; rows below
    it keep row-locally, and only the boundary bucket's rows (~1/4096 of
    the source) pay a window. Exact integer token sums — deterministic
    under any partitioning, and equal by construction to the plain
    per-source hash-ordered prefix (the oracle form)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"tb{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    nt = (
        F.col(cost_col).cast("long")
        if cost_col is not None
        else F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    )
    base = docs.withColumn("__h", h).withColumn("__nt", nt)
    base = base.withColumn("__b", (F.col("__h") / F.lit(_TB_WIDTH)).cast("int"))
    # NULL sources get their own budget: an equi-join on a NULL key never
    # matches, so bucket/join on a sentinel-coalesced key (the NUL prefix
    # cannot collide with a real source string)
    null_sentinel = "\x00__null_source__"
    src_key = F.coalesce(F.col(source_col).cast("string"), F.lit(null_sentinel))
    base = base.withColumn("__src", src_key)
    per = (
        base.groupBy("__src", "__b")
        .agg(F.sum("__nt").alias("t"))
        .collect()
    )
    by_src: dict = {}
    for r in per:
        by_src.setdefault(r["__src"], []).append((int(r["__b"]), int(r["t"])))
    rows = []
    for src, lst in by_src.items():
        run = 0
        bstar, remaining = None, 0
        for b, t in sorted(lst):
            if run + t >= budget_tokens:
                bstar, remaining = b, budget_tokens - run
                break
            run += t
        if bstar is None:  # whole source fits
            bstar, remaining = _TB_BUCKETS, 0
        rows.append((src, bstar, remaining))
    spark = docs.sparkSession
    bounds = spark.createDataFrame(
        rows, schema="__src string, __bstar int, __rem long"
    )
    j = base.join(F.broadcast(bounds), "__src")
    below = j.where(F.col("__b") < F.col("__bstar"))
    boundary = j.where(F.col("__b") == F.col("__bstar"))
    w = (
        Window.partitionBy("__src")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = boundary.withColumn(
        "__before", F.coalesce(F.sum("__nt").over(w), F.lit(0))
    ).where(F.col("__before") < F.col("__rem"))
    out = below.unionByName(boundary.drop("__before"))
    return out.drop("__h", "__nt", "__b", "__src", "__bstar", "__rem")


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep ``n`` rows
    (per group, if ``group_cols``) with inclusion probability proportional
    to ``weight_col`` — Efraimidis & Spirakis (2006) exponential races on
    the repo's stable 60-bit md5 hash instead of rand(), so the sample is
    reproducible, repartition-stable, and recomputable by the DuckDB gate.

    Each row draws the deterministic uniform ``u = (h + 1) / 2^60`` from
    hash(seed, key) and races with key ``-ln(u) / w``; the ``n`` smallest
    race keys win — exactly weighted sampling without replacement. ``u``
    is an exact dyadic rational and the race key is one mirrored ln + one
    division, so both engines order identically (md5 ties are broken by
    the key column anyway).

    Rows with NULL, zero, or negative weight never win (excluded — the
    standard convention). NULL sampling keys hash to NULL and are dropped,
    matching deterministic_sample.

    Scale shape: one window rank per group (single hash exchange) — or,
    ungrouped, a TakeOrdered top-n that never materializes a global sort.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    race = -F.log(u) / F.col(weight_col).cast("double")
    # NULL sampling keys must be DROPPED, not raced: their race key is
    # NULL and Spark sorts NULLS FIRST ascending, so a NULL-key row would
    # deterministically win every top-n (round-5 ADVICE fix).
    cand = df.where(
        F.col(key_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col).cast("double") > 0)
    ).withColumn("__race", race)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("__race", key_col)
        return (
            cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .drop("__rn", "__race")
        )
    # ungrouped: orderBy().limit() is a distributed TakeOrdered when it
    # feeds a collect/write; callers chaining further distributed work
    # should pass a dummy group instead (GlobalLimit funnel, CLAUDE.md r4)
    return cand.orderBy("__race", key_col).limit(n).drop("__race")
