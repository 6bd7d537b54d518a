"""Corpus vocabulary statistics — the tokenizer-design operator: term
frequency, document frequency, Zipf rank, and cumulative corpus coverage
("how many vocabulary entries cover X% of all tokens").

Definitions (shared verbatim with the DuckDB oracle):

- tokens: whitespace tokens of the normalized (trim, collapse-ws, lower)
  text — the same tokenizer as tf-idf (text/tfidf.py), so vocabulary and
  keyword statistics are comparable;
- count = corpus-wide occurrences of the term, doc_freq = number of
  documents containing it at least once;
- rank = position under the deterministic (count desc, term asc) total
  order; share = count / total tokens; cum_share = running share through
  this rank (the Zipf coverage curve).

Scale shape: one (term, doc_id) hash aggregation (map-side combining
absorbs hot terms before the shuffle), one term-keyed roll-up — this
two-level plan replaces a countDistinct Expand, so no row doubling on the
wide exchange. The top-k is a TakeOrdered over the already-aggregated
term table (per-partition k, single merge of partitions×k rows — bounded
by k and partition count, never by corpus size); the k-row cumulative
window runs on that bounded result. The only driver value is the total
token count (one count job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, count, doc_freq) for every vocabulary entry in the corpus."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = df.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("term")
    ).where(F.col("term") != "")
    per_doc = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("term").agg(
        F.sum("tf").alias("count"), F.count(F.lit(1)).alias("doc_freq")
    )


def vocab_topk(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, count, doc_freq, rank, share, cum_share) — the top-``k``
    vocabulary entries with the Zipf coverage curve, deterministically
    ordered by (count desc, term asc)."""
    counts = token_counts(df, text_col=text_col, id_col=id_col).persist()
    # total tokens = Σ term counts — derived from the (tiny) vocabulary
    # table, NOT a second corpus tokenization scan; the persist covers the
    # total agg + the TakeOrdered and is released before returning
    total = int(counts.agg(F.sum("count")).collect()[0][0] or 0)
    order = [F.desc("count"), F.asc("term")]
    # orderBy().limit() here is a distributed TakeOrdered over the TERM
    # table (already one row per vocabulary entry); the k surviving rows
    # are materialized (localCheckpoint) so the persist can be released
    # eagerly, and are then safe under a single-partition cumulative window
    top = counts.orderBy(*order).limit(k).localCheckpoint()
    counts.unpersist()
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .withColumn(
            "share", F.round(F.col("count") / F.lit(float(total)), 6)
        )
        .withColumn(
            "cum_share",
            F.round(F.sum("count").over(w) / F.lit(float(total)), 6),
        )
        .select(
            "term",
            F.col("count").cast("long").alias("count"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("rank").cast("int").alias("rank"),
            "share",
            "cum_share",
        )
    )


def top_terms_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, term, count, rank) — the top-``k`` terms within each group
    (per-source vocabulary fingerprint: what distinguishes one corpus
    slice's language from another's). ONE (group, term) aggregation
    (map-side partials; output bounded by per-group vocabulary, not
    rows), then the rank window runs per GROUP over that aggregated
    table — partitioned, never a single-task global sort. Deterministic
    (count desc, term asc) total order."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = df.select(
        F.col(group_col).alias("group"),
        F.explode(F.split(norm, " ")).alias("term"),
    ).where(F.col("term") != "")
    counts = toks.groupBy("group", "term").agg(
        F.count(F.lit(1)).cast("long").alias("count")
    )
    w = Window.partitionBy("group").orderBy(F.desc("count"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("group", "term", "count", F.col("rank").cast("int").alias("rank"))
    )
