"""Per-document keyword extraction by tf-idf — the classic corpus
summarization/tagging operator (top-k most distinctive terms per doc).

Definitions (shared verbatim with the DuckDB oracle):

- tokens: whitespace tokens of the normalized (trim, collapse-ws, lower)
  text; tf = the term's occurrence count IN the doc;
- df = number of documents containing the term at least once;
- idf = ln((N + 1) / (df + 1)) + 1 (the sklearn-style smoothed idf — no
  zero/negative weights, so corpus-universal terms still rank below
  distinctive ones instead of vanishing);
- score = tf * idf; top-``k`` terms per doc by (score desc, term asc) —
  the tie-break makes the listing deterministic.

Scale shape: one (doc, term) hash aggregation for tf, one term-keyed
aggregation for df (both map-side-combining), a term-keyed join to
attach idf, and one per-doc window for the top-k. All JVM expressions;
the only driver value is the corpus doc count N (one count-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """(doc_id, term, tf, df, score, rank) — the top-``k`` tf-idf terms
    per document; ``min_df`` drops hapax noise terms from consideration."""
    n_docs = df.count()
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = df.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.col("tf")
        * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
