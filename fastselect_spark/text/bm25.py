"""BM25 ranked retrieval over a document corpus.

Okapi BM25 (Robertson & Zaragoza 2009) with the Lucene idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive, so a term in
more than half the corpus is damped, not negated).

score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))

Scale shape (the plan you want at 100 TB):

- tokenize + doc length are narrow projections; corpus stats (N, avgdl)
  are one scalar aggregate;
- postings are built by exploding tokens and filtering to the query
  vocabulary BEFORE any exchange (the only shuffled rows are matches of
  the query terms — a tiny fraction of the corpus);
- per-doc length rides along with each posting row (an int), so no
  corpus-wide join is needed to score;
- document frequencies form a |vocabulary|-row frame that is
  broadcast-joined back onto the postings;
- the query-term table is broadcast; scoring aggregates on
  ``(query_id, doc_id)`` over candidate postings only; top-k is a
  per-query window over the candidates.

Determinism contract: ranking orders by the score ROUNDED to
``round_decimals`` (then doc_id) so cross-engine float ulp noise cannot
flip ranks — same convention as the cosine/ADC oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(
        F.regexp_replace(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
        ),
        " ",
    )


def _bm25_scored(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_decimals: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """(scored, postings): the pre-top-k score frame plus the persisted
    branch-point postings handle (callers must unpersist it). Split out
    so tools/explain_audit.py can inspect the join plan before
    ``bm25_topk`` checkpoints it away."""
    spark = docs.sparkSession

    # corpus side: tokens + per-doc length (narrow)
    toked = docs.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks"))

    # scalar corpus stats: one tiny aggregate, two literals
    n_docs, avgdl = toked.agg(
        F.count(F.lit(1)), F.avg("dl")
    ).first()

    # query-term table (set semantics per query); tiny -> broadcast
    qterms = [
        (qid, t)
        for qid, qtext in queries
        for t in sorted(set(qtext.lower().split()))
    ]
    qdf = spark.createDataFrame(qterms, schema="query_id long, term string")
    vocab = sorted({t for _, t in qterms})

    # postings: explode, filter to query vocabulary BEFORE the shuffle,
    # dl rides along so no corpus join is needed later. Persisted at the
    # branch point — it feeds BOTH the df/idf aggregate and the scoring
    # join, and an unpersisted branch re-runs the corpus explode per side
    # (the minhash lesson).
    postings = (
        toked.select(id_col, "dl", F.explode("__toks").alias("term"))
        .where(F.col("term").isin(vocab))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    ).persist()

    # document frequency per term: |vocab|-row frame, broadcast back
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
    )

    contrib = (
        postings.join(F.broadcast(idf), "term")
        .join(F.broadcast(qdf), "term")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
            ),
        )
    )

    scored = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum("contrib"), round_decimals).alias("score")
    )
    return scored, postings


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_decimals: int = 6,
) -> DataFrame:
    """(query_id, rank, doc_id, score): BM25 top-k docs per query.

    ``queries`` is a small driver-side list of (query_id, query_text);
    duplicate terms within one query count once (set semantics, the
    standard bag-of-terms simplification).
    """
    scored, postings = _bm25_scored(
        docs, queries, k1, b, text_col, id_col, round_decimals
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    result = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score")
    )
    # materialize the (tiny) result, then drop the branch-point cache —
    # persist-hygiene: no session-lifetime caches escape the operator
    result = result.localCheckpoint()
    postings.unpersist()
    return result
