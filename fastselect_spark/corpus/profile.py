"""One-shuffle table profiling: per-column row/null/distinct counts,
min/max, and the modal value — the data-quality report every training
pipeline runs before featurizing a new corpus drop.

Scale shape: the naive plan is p `countDistinct` + p `groupBy(col)`
top-value jobs — p scans and p exchanges, plus the p-branch Expand
codegen blowup the CLAUDE.md `countDistinct` lesson measured. Instead
the table is melted ONCE to ``(column, value)`` long form (a row-local
stack/explode, values canonicalized to strings), and everything —
null count, exact distinct count, min/max, modal value — comes out of
ONE exchange on ``(column, value)`` plus a rollup exchange over the
already-reduced (column, value, count) rows (size p·distinct, tiny next
to the data). Cost at any width: one scan + one shuffle of the melted
table.

Value canonicalization: every column is CAST to string before the melt
(one shared value domain), so min/max/top are over the STRING form —
documented contract, deterministic, and exactly reproducible in SQL.
Modal-value ties break to the smallest string (count DESC, value ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct,
    min_value, max_value, top_value, top_count)``. Distinct/min/max/top
    are over non-null values in their canonical string form."""
    cols = cols or df.columns
    melted = df.select(
        F.stack(
            F.lit(len(cols)),
            *[x for c in cols for x in (F.lit(c), F.col(c).cast("string"))],
        ).alias("column", "value")
    )
    per_value = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("column").orderBy(
        F.col("value").isNull().asc(),  # nulls last: top/min/max want values
        F.col("cnt").desc(),
        F.col("value").asc(),
    )
    return (
        per_value.withColumn("rk", F.row_number().over(w))
        .groupBy("column")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0)).alias(
                "n_null"
            ),
            F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias(
                "n_distinct"
            ),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max(
                F.when(
                    (F.col("rk") == 1) & F.col("value").isNotNull(),
                    F.col("value"),
                )
            ).alias("top_value"),
            F.max(
                F.when(
                    (F.col("rk") == 1) & F.col("value").isNotNull(),
                    F.col("cnt"),
                )
            ).alias("top_count"),
        )
    )


def profile_drift(
    a: DataFrame, b: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Column-level drift between two table snapshots — the data-quality
    complement to the value-distribution monitors (PSI/KS): null-fraction
    movement, distinct-cardinality movement, and modal-value change per
    column, plus schema drift (a column present in only one snapshot
    surfaces with the other side NULL via the full-outer join).

    Cost: two :func:`table_profile` passes (each ONE melt exchange +
    a tiny rollup) + a join over the p-row profile tables. Null fractions
    are exact-integer quotients — IEEE-identical cross-engine."""
    keep = ["n_rows", "n_null", "n_distinct", "top_value"]

    def side(df: DataFrame, s: str) -> DataFrame:
        prof = table_profile(df, cols)
        return prof.select(
            "column", *[F.col(c).alias(f"{c}{s}") for c in keep]
        )

    j = side(a, "_a").join(side(b, "_b"), "column", "full_outer")
    frac_a = F.col("n_null_a").cast("double") / F.col("n_rows_a").cast("double")
    frac_b = F.col("n_null_b").cast("double") / F.col("n_rows_b").cast("double")
    return j.select(
        "column",
        "n_rows_a",
        "n_rows_b",
        frac_a.alias("null_frac_a"),
        frac_b.alias("null_frac_b"),
        (frac_b - frac_a).alias("null_frac_delta"),
        "n_distinct_a",
        "n_distinct_b",
        "top_value_a",
        "top_value_b",
        (
            ~(F.col("top_value_a").eqNullSafe(F.col("top_value_b")))
        ).cast("int").alias("top_changed"),
    )


def dataset_checksum(
    df: DataFrame,
    cols: list[str] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Order- and partitioning-invariant dataset checksum — the lineage
    primitive for dataset versioning: two corpus drops (or the same drop
    before/after a rewrite, repartition, or engine migration) are
    byte-level equal on ``cols`` iff their (n_rows, checksum) pairs match
    per group. Complements table_profile (statistical drift) with exact
    content identity, and the runtime/checkpoint.py lineage manifest with
    a content address the manifest can embed.

    Shape: ONE map-side-combined aggregation — each row hashes row-locally
    to the portable 60-bit md5 prefix (the cross-engine hash family:
    ``conv(substring(md5(x),1,15),16,10)`` == DuckDB
    ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)`` == hashlib), and the
    group checksum is the SUM of row hashes in a decimal(38,0)
    accumulator (commutative => order/partitioning-invariant; ANSI-safe:
    2^60 per row x 10^12 rows ~ 10^30 < 10^38, no wraparound reliance).
    Shuffle is bounded by the group alphabet; ungrouped it is one scalar.

    Row canonicalization: each column CAST to string, NULL kept distinct
    from the string 'NULL' via a chr(1)-prefixed sentinel, fields joined
    with the chr(31) unit separator (stripped from real text by
    text/clean.py, and absent from the synthetic corpus). The checksum is
    returned AS A STRING so it survives any client's integer width.

    Returns (group_cols..., n_rows:bigint, checksum:string)."""
    group_cols = group_cols or []
    cols = cols if cols is not None else [
        c for c in df.columns if c not in group_cols
    ]
    sep = chr(31)  # unit separator
    sentinel = chr(1) + "NULL"  # distinct from a real string 'NULL'
    canon = []
    for i, c in enumerate(cols):
        if i:
            canon.append(F.lit(sep))
        canon.append(F.coalesce(F.col(c).cast("string"), F.lit(sentinel)))
    row_hash = (
        F.conv(F.substring(F.md5(F.concat(*canon)), 1, 15), 16, 10)
        .cast("decimal(38,0)")
    )
    return (
        df.select(*group_cols, row_hash.alias("__h"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__h")
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
    )
