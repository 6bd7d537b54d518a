"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (transcripts -> featurize ->
as-of join -> feature matrix -> chi2 + MI scores) on sf0.001.
``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-equivalent oracle where SQL-expressible.

All float outputs are rounded to a fixed number of decimals IN BOTH the
Spark query and the oracle SQL, because cross-engine float summation order
differs at ~1e-12 relative error and the driver compares value hashes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastselect_spark.data.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL
from fastselect_spark.featurize import asof_join, featurize_transcripts
from fastselect_spark.select import chi2, mi_matrices
from fastselect_spark.select.mrmr import MRMRSelector

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)


# Shared Spark/DuckDB SQL for the discrete lineitem-derived code matrix used
# by the MI/chi2 scoring queries (small integer codes, shared vocab).
_LINEITEM_CODES_SQL = """
SELECT
    CAST(l_linenumber AS INT)                    AS f_line,
    CAST(FLOOR(l_quantity / 10) AS INT)          AS f_qty,
    CAST(ROUND(l_discount * 100) AS INT)         AS f_disc,
    CAST(ROUND(l_tax * 100) AS INT)              AS f_tax,
    CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS y
FROM lineitem
"""

_MI_FEATURES = ["f_line", "f_qty", "f_disc", "f_tax"]


# ---------------------------------------------------------------- queries --

def _q_transcripts_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir)


def _q_featurize_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = featurize_transcripts(_transcripts(spark, sf_dir))
    return feat.select(
        "conv_id",
        "turn_idx",
        F.col("turn_gap_s").cast("double").alias("turn_gap_s"),
        F.col("session_id").cast("long").alias("session_id"),
        F.col("role_run_len").cast("long").alias("role_run_len"),
        F.col("tool_calls_so_far").cast("long").alias("tool_calls_so_far"),
        F.col("label").cast("int").alias("label"),
    )


def _q_featurize_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = featurize_transcripts(_transcripts(spark, sf_dir))
    return feat.select(
        "conv_id",
        "turn_idx",
        F.col("n_tokens").cast("double").alias("n_tokens"),
        F.round("tokens_sum_5", 6).alias("tokens_sum_5"),
        F.round("tokens_avg_5", 6).alias("tokens_avg_5"),
        F.round("tokens_sum_10m", 6).alias("tokens_sum_10m"),
    )


def _q_backfill_last_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastselect_spark.featurize import add_backfill

    tr = _transcripts(spark, sf_dir)
    return add_backfill(tr, ["tool"]).select("conv_id", "turn_idx", "tool_ffill")


def _q_asof_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = featurize_transcripts(_transcripts(spark, sf_dir))
    right = feat.groupBy("conv_id", "session_id").agg(
        F.max("ts").alias("ts"),
        F.round(F.avg("n_tokens"), 6).alias("sess_avg_tokens"),
        F.count(F.lit(1)).cast("long").alias("sess_n_turns"),
    )
    joined = asof_join(
        feat.select("conv_id", "turn_idx", "ts"),
        right.select("conv_id", "ts", "sess_avg_tokens", "sess_n_turns"),
        strategy="window",
    )
    return joined.select(
        "conv_id", "turn_idx", "sess_avg_tokens_asof", "sess_n_turns_asof"
    )


def _q_chi2_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "lineitem")
    m = spark.sql(_LINEITEM_CODES_SQL)
    stats, _ = chi2(m, _MI_FEATURES, "y")
    return spark.createDataFrame(
        [(f, round(float(s), 4)) for f, s in zip(_MI_FEATURES, stats)],
        schema="feature string, chi2 double",
    )


def _q_mi_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "lineitem")
    m = spark.sql(_LINEITEM_CODES_SQL)
    rel, _ = mi_matrices(m, _MI_FEATURES, "y", unit="bit", compute_redundancy=False)
    return spark.createDataFrame(
        [(f, round(float(r), 6)) for f, r in zip(_MI_FEATURES, rel)],
        schema="feature string, mi_bits double",
    )


def _q_mrmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "lineitem")
    m = spark.sql(_LINEITEM_CODES_SQL)
    sel = MRMRSelector(n_features_to_select=3, method="MID").fit(m, _MI_FEATURES, "y")
    return spark.createDataFrame(
        [(int(r), f) for r, f in enumerate(sel.selected_cols_)],
        schema="rank int, feature string",
    )


def _q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                  AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)             AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4)                  AS avg_qty,
               COUNT(*)                                   AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """
    )


def _q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(o.o_totalprice), 2) AS revenue,
               COUNT(*)                      AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 10
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_derive": _q_transcripts_derive,
        "featurize_sessions": _q_featurize_sessions,
        "featurize_rolling": _q_featurize_rolling,
        "backfill_last_tool": _q_backfill_last_tool,
        "asof_session_stats": _q_asof_session_stats,
        "chi2_scores": _q_chi2_scores,
        "mi_relevance": _q_mi_relevance,
        "mrmr_selection": _q_mrmr_selection,  # greedy loop: rows-only check
        "q1_pricing_summary": _q_q1_pricing_summary,
        "top_customers": _q_top_customers,
    }


# ------------------------------------------------------------- oracle SQL --

_FEATURIZE_BASE = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
feat0 AS (
    SELECT *,
        CAST(FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) AS DOUBLE) AS gap_raw,
        LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tok_raw
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
feat1 AS (
    SELECT *,
        COALESCE(gap_raw, 0.0) AS turn_gap_s,
        CASE WHEN gap_raw IS NULL OR gap_raw > 300.0 THEN 1 ELSE 0 END AS session_start,
        CAST(n_tok_raw AS DOUBLE) AS n_tokens
    FROM feat0
),
feat2 AS (
    SELECT *,
        SUM(session_start) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS UNBOUNDED PRECEDING) - 1 AS session_id,
        CASE WHEN LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
                  OR role <> LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
             THEN 1 ELSE 0 END AS role_changed,
        SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)
            AS tool_calls_so_far,
        CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS label
    FROM feat1
),
feat AS (
    SELECT *,
        SUM(role_changed) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS UNBOUNDED PRECEDING) - 1 AS role_run_id
    FROM feat2
)
"""

_MI_ORACLE = f"""
WITH m AS ({_LINEITEM_CODES_SQL}),
long AS (
    SELECT 'f_line' AS feature, f_line AS v, y FROM m UNION ALL
    SELECT 'f_qty', f_qty, y FROM m UNION ALL
    SELECT 'f_disc', f_disc, y FROM m UNION ALL
    SELECT 'f_tax', f_tax, y FROM m
),
joint AS (SELECT feature, v, y, CAST(COUNT(*) AS DOUBLE) AS c FROM long GROUP BY 1, 2, 3),
tot AS (SELECT feature, SUM(c) AS n FROM joint GROUP BY 1),
px AS (SELECT feature, v, SUM(c) AS cx FROM joint GROUP BY 1, 2),
py AS (SELECT feature, y, SUM(c) AS cy FROM joint GROUP BY 1, 2)
SELECT j.feature,
       ROUND(SUM((c / n) * LOG2((c / n) / ((cx / n) * (cy / n) + 1e-12))), 6) AS mi_bits
FROM joint j
JOIN tot USING (feature)
JOIN px USING (feature, v)
JOIN py USING (feature, y)
GROUP BY j.feature
"""

_CHI2_ORACLE = f"""
WITH m AS ({_LINEITEM_CODES_SQL}),
long AS (
    SELECT 'f_line' AS feature, CAST(f_line AS DOUBLE) AS v, y FROM m UNION ALL
    SELECT 'f_qty', f_qty, y FROM m UNION ALL
    SELECT 'f_disc', f_disc, y FROM m UNION ALL
    SELECT 'f_tax', f_tax, y FROM m
),
cls AS (SELECT feature, y, SUM(v) AS obs, COUNT(*) AS n_c FROM long GROUP BY 1, 2),
tot AS (SELECT feature, SUM(obs) AS fc, SUM(n_c) AS n FROM cls GROUP BY 1)
SELECT c.feature,
       ROUND(SUM(CASE WHEN c.n_c * t.fc / t.n > 1e-12
                 THEN POW(c.obs - c.n_c * t.fc / t.n, 2) / (c.n_c * t.fc / t.n)
                 ELSE 0 END), 4) AS chi2
FROM cls c JOIN tot t USING (feature)
GROUP BY c.feature
"""


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_derive": TRANSCRIPTS_FROM_EVENTS_SQL,
        "featurize_sessions": _FEATURIZE_BASE
        + """
        SELECT conv_id, turn_idx, turn_gap_s,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, role_run_id
                    ORDER BY turn_idx) AS BIGINT) AS role_run_len,
               CAST(tool_calls_so_far AS BIGINT) AS tool_calls_so_far,
               CAST(label AS INT) AS label
        FROM feat
        """,
        "featurize_rolling": _FEATURIZE_BASE
        + """
        SELECT conv_id, turn_idx, n_tokens,
               ROUND(SUM(n_tokens) OVER w5, 6)  AS tokens_sum_5,
               ROUND(AVG(n_tokens) OVER w5, 6)  AS tokens_avg_5,
               ROUND(SUM(n_tokens) OVER (PARTITION BY conv_id
                     ORDER BY FLOOR(EPOCH(ts))
                     RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 6) AS tokens_sum_10m
        FROM feat
        WINDOW w5 AS (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        """,
        "backfill_last_tool": f"""
        WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})
        SELECT conv_id, turn_idx,
               LAST_VALUE(tool IGNORE NULLS) OVER (PARTITION BY conv_id
                   ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) AS tool_ffill
        FROM transcripts
        """,
        "asof_session_stats": _FEATURIZE_BASE
        + """
        , sess AS (
            SELECT conv_id, session_id, MAX(ts) AS ts,
                   ROUND(AVG(n_tokens), 6) AS sess_avg_tokens,
                   CAST(COUNT(*) AS BIGINT) AS sess_n_turns
            FROM feat GROUP BY conv_id, session_id
        )
        SELECT f.conv_id, f.turn_idx,
               s.sess_avg_tokens AS sess_avg_tokens_asof,
               s.sess_n_turns    AS sess_n_turns_asof
        FROM feat f ASOF LEFT JOIN sess s
            ON f.conv_id = s.conv_id AND f.ts >= s.ts
        """,
        "chi2_scores": _CHI2_ORACLE,
        "mi_relevance": _MI_ORACLE,
        "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                  AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)             AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4)                  AS avg_qty,
               COUNT(*)                                   AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(o.o_totalprice), 2) AS revenue,
               COUNT(*)                      AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 10
        """,
    }


# ----------------------------------------------------------------- entry --

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts -> featurize -> as-of join -> matrix -> scores."""
    sf_dir = "/root/testdata/sf0.001"
    feat = featurize_transcripts(_transcripts(spark, sf_dir))
    sess = feat.groupBy("conv_id", "session_id").agg(
        F.max("ts").alias("ts"), F.avg("n_tokens").alias("sess_avg_tokens")
    )
    mat = asof_join(
        feat,
        sess.select("conv_id", "ts", "sess_avg_tokens"),
        strategy="window",
    )
    # discretize into small integer codes for the MI pass
    codes = mat.select(
        F.least(F.col("session_id"), F.lit(7)).cast("int").alias("c_session"),
        F.least(F.col("role_run_len"), F.lit(5)).cast("int").alias("c_runlen"),
        F.least(F.floor(F.col("turn_gap_s") / 60.0), F.lit(10)).cast("int").alias("c_gap"),
        F.least(F.floor(F.col("sess_avg_tokens_asof")), F.lit(10)).cast("int").alias("c_stok"),
        F.col("label").cast("int").alias("label"),
    )
    fcols = ["c_session", "c_runlen", "c_gap", "c_stok"]
    stats, pvals = chi2(codes, fcols, "label")
    rel, _ = mi_matrices(codes, fcols, "label", compute_redundancy=False)
    return spark.createDataFrame(
        [
            (c, float(s), float(pv), float(r))
            for c, s, pv, r in zip(fcols, stats, pvals, rel)
        ],
        schema="feature string, chi2 double, p_value double, mi_bits double",
    )
