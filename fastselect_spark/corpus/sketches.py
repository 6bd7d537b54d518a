"""Mergeable cardinality / frequency sketches with cross-engine-exact math.

Graft-added (the reference has no sketch surface; its distinct/frequency
needs are in-memory ndarray passes, e.g. np.unique in
/root/reference/src/fast_select/mi.py). At 100 TB, exact per-group
``countDistinct`` state and exact per-key frequency maps are unbounded;
the standard scale answers are HyperLogLog registers (fixed 2^p ints per
group) and a count-min sketch (fixed depth x width counters, any key set).

Both are built here so every intermediate is EXACT INTEGER arithmetic on
the portable 60-bit md5-prefix hash family (the repo's cross-engine hash,
CLAUDE.md round-3), with exactly ONE mirrored float quotient at the end:

- HLL registers sum dyadic terms ``2^(Q - rho)`` as DECIMAL(38,0) (never
  a float harmonic mean), so Spark and DuckDB agree bit-for-bit until the
  single ``alpha*m^2*2^Q / S`` division, which both engines perform as the
  same literal-over-double IEEE op. The small-range branch is linear
  counting ``m*ln(m/V)`` on exact integers — again one mirrored call.
- count-min is integers end to end (bucket sums, min over depth rows).

Scale shape: HLL is one map-side-combining aggregation to (group,
register) then a tiny (group)-level fold — register count per group is
2^p regardless of input size. count-min build is one aggregation bounded
by depth*width cells; lookups broadcast the sketch (it is a few KB by
construction), so the probe side never shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

HASH_BITS = 60  # md5-prefix family: conv(substring(md5(x),1,15),16,10)


def _hash60(col: str) -> str:
    return f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant (Flajolet et al. 2007)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate over ``value_col``.

    Returns ``group_cols + (registers_hit long, hll_estimate double)``.
    NULL values are ignored (COUNT DISTINCT semantics); a group whose
    values are all NULL is absent from the output.

    The register layout: 60-bit hash h -> register index ``h % 2^p``,
    rank ``rho`` = leading-zero count of the remaining ``60-p`` bits + 1.
    Small-range correction (linear counting) applies below ``2.5*m`` when
    empty registers remain, per the original paper.
    """
    rows = hll_register_rows(df, group_cols, value_col, p)
    regs = rows.groupBy(*group_cols, "__idx").agg(F.max("__rho").alias("__m"))
    return hll_estimate_from_registers(regs, group_cols, p)


def hll_register_rows(
    df: DataFrame, group_cols: list[str], value_col: str, p: int
) -> DataFrame:
    """The per-row ``group_cols + (__idx, __rho)`` register projection —
    shared by the batch fold and the streaming register maintenance
    (streaming/sketches.py), so their register tables are identical by
    construction."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    w_bits = HASH_BITS - p
    q = w_bits + 1  # max rho (all remaining bits zero)
    h = F.expr(_hash60(value_col))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .select(
            *group_cols,
            F.expr(f"__h % {m}").alias("__idx"),
            F.expr(
                f"CASE WHEN __h DIV {m} = 0 THEN {q} "
                f"ELSE {w_bits} + 1 - length(bin(__h DIV {m})) END"
            ).alias("__rho"),
        )
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], p: int
) -> DataFrame:
    """Fold a register table ``group_cols + (__idx, __m)`` into the HLL
    estimate — the finalize step shared by :func:`hll_distinct` and the
    streaming register maintenance (streaming/sketches.py), so batch and
    stream agree bit-for-bit on identical registers."""
    m = 1 << p
    q = HASH_BITS - p + 1
    alpha = hll_alpha(m)
    numer = alpha * m * m * float(2**q)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {q} - __m) AS DECIMAL(38,0))")
        ).alias("__s_hit"),
        F.count(F.lit(1)).alias("registers_hit"),
    )
    # Absent registers carry rho=0 -> term 2^Q each; V = m - hit of them.
    s_total = F.expr(
        f"__s_hit + CAST({m} - registers_hit AS DECIMAL(38,0))"
        f" * CAST(shiftleft(CAST(1 AS BIGINT), {q}) AS DECIMAL(38,0))"
    )
    raw = F.expr(f"{numer!r} / CAST(__s_total AS DOUBLE)")
    est = F.expr(
        f"CASE WHEN __raw <= {2.5 * m!r} AND registers_hit < {m} "
        f"THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE)"
        f" / CAST({m} - registers_hit AS DOUBLE)) "
        f"ELSE __raw END"
    )
    return (
        agg.withColumn("__s_total", s_total)
        .withColumn("__raw", raw)
        .select(*group_cols, "registers_hit", est.alias("hll_estimate"))
    )


def hll_distinct_sql(
    source_sql: str,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> str:
    """The DuckDB mirror of :func:`hll_distinct` (for contract oracles):
    identical hash, register, dyadic-decimal and literal-quotient math."""
    m = 1 << p
    w_bits = HASH_BITS - p
    q = w_bits + 1
    numer = hll_alpha(m) * m * m * float(2**q)
    g = ", ".join(group_cols)
    return f"""
WITH rows0 AS (
  SELECT {g},
         CAST('0x' || substr(md5(CAST({value_col} AS STRING)), 1, 15) AS BIGINT) AS h
  FROM ({source_sql}) src WHERE {value_col} IS NOT NULL
), regs AS (
  SELECT {g}, h % {m} AS idx,
         MAX(CASE WHEN h // {m} = 0 THEN {q}
                  ELSE {w_bits} + 1 - length(bin(h // {m})) END) AS mreg
  FROM rows0 GROUP BY {g}, h % {m}
), agg AS (
  SELECT {g},
         SUM(CAST(CAST(power(2, {q} - mreg) AS BIGINT) AS DECIMAL(38,0))) AS s_hit,
         COUNT(*) AS registers_hit
  FROM regs GROUP BY {g}
), fin AS (
  SELECT {g}, registers_hit,
         s_hit + CAST({m} - registers_hit AS DECIMAL(38,0))
               * CAST(CAST(power(2, {q}) AS BIGINT) AS DECIMAL(38,0)) AS s_total
  FROM agg
)
SELECT {g}, registers_hit,
       CASE WHEN {numer!r} / CAST(s_total AS DOUBLE) <= {2.5 * m!r}
                 AND registers_hit < {m}
            THEN CAST({m} AS DOUBLE)
                 * ln(CAST({m} AS DOUBLE) / CAST({m} - registers_hit AS DOUBLE))
            ELSE {numer!r} / CAST(s_total AS DOUBLE) END AS hll_estimate
FROM fin
"""


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: ``(row int, bucket long,
    cnt long)`` with ``depth`` independent salted-md5 hash rows of
    ``width`` buckets. NULL keys are ignored. The output is bounded by
    depth*width cells no matter the input size — the fixed-state
    frequency summary a 100 TB key stream needs."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    buckets = [
        F.expr(
            f"CAST(conv(substring(md5(CONCAT('{j}:', CAST({key_col} AS STRING))),"
            f" 1, 15), 16, 10) AS BIGINT) % {width}"
        ).alias(f"__b{j}")
        for j in range(depth)
    ]
    wexpr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    wide = df.where(F.col(key_col).isNotNull()).select(
        *buckets, wexpr.alias("__w")
    )
    stack = ", ".join(f"{j}, __b{j}" for j in range(depth))
    melted = wide.selectExpr(
        f"stack({depth}, {stack}) AS (row, bucket)", "__w"
    )
    return melted.groupBy("row", "bucket").agg(F.sum("__w").alias("cnt"))


def countmin_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate counts for ``keys[key_col]`` from a sketch built with
    the same (depth, width): ``cm_estimate = min over rows`` of the bucket
    counters (the classic over-estimate-only bound). The sketch side is
    broadcast — it is depth*width cells by construction — so the probe
    side never shuffles for the join."""
    probes = keys.select(
        key_col,
        *[
            F.expr(
                f"CAST(conv(substring(md5(CONCAT('{j}:', CAST({key_col} AS STRING))),"
                f" 1, 15), 16, 10) AS BIGINT) % {width}"
            ).alias(f"__b{j}")
            for j in range(depth)
        ],
    )
    stack = ", ".join(f"{j}, __b{j}" for j in range(depth))
    melted = probes.selectExpr(key_col, f"stack({depth}, {stack}) AS (row, bucket)")
    joined = melted.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate")
    )


def hll_merge(
    regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge two HLL register tables (``group_cols + (__idx, __m)``,
    same p): per-register max — the property that makes the sketch
    distributable: shard-local register tables from any partitioning
    union-merge into the exact registers of the combined data, so a
    1000-executor ingest folds per-shard sketches without re-reading
    rows. Feed the result to :func:`hll_estimate_from_registers`."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__m").alias("__m"))
    )


def countmin_merge(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Merge two count-min sketches built with the same (depth, width):
    per-cell SUM — the additive counterpart of :func:`hll_merge`, so
    shard-local sketches from any partitioning fold into exactly the
    combined stream's counters without re-reading rows."""
    return (
        sketch_a.unionByName(sketch_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
