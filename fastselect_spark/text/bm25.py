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
- document frequencies form a |vocabulary|-row aggregate collected to the
  driver and folded back as literal per-term idf expressions (the idf
  "join" and the query-term "join" are constant-folded CASE/explode
  projections — both tables are driver-known, so no broadcast builds);
- scoring aggregates on ``(query_id, doc_id)`` over candidate postings
  only; top-k is a per-query window over the candidates.

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
    # corpus side: tokens + per-doc length (narrow)
    toked = docs.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks"))

    # scalar corpus stats: one tiny aggregate, two literals
    n_docs, avgdl = toked.agg(
        F.count(F.lit(1)), F.avg("dl")
    ).first()

    # query-term list (set semantics per query); driver-side by definition
    qterms = [
        (qid, t)
        for qid, qtext in queries
        for t in sorted(set(qtext.lower().split()))
    ]
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

    # document frequency per term: a |vocab|-row aggregate COLLECTED to the
    # driver (this also fills the postings cache), then folded back in as
    # literal per-term CASE expressions — both the idf table and the
    # query-term table are driver-known, so joining them cost two
    # broadcast-relation builds (a Spark job each) for what constant
    # folding does for free (13 -> ~5 jobs). The idf expression tree
    # mirrors the joined version exactly (same double ops on the same
    # values, evaluated by the same JVM log), and the query-id explode
    # emits exactly the rows the qdf inner join did, so scores are
    # bit-identical.
    df_of = {
        r["term"]: int(r["df"])
        for r in postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }

    def _idf_lit(df_val: int):
        return F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.lit(float(df_val)) + 0.5)
            / (F.lit(float(df_val)) + 0.5)
        )

    idf_expr = None
    qids_expr = None
    for t in vocab:
        if t not in df_of:  # term matches no document: no postings rows
            continue
        cond = F.col("term") == t
        branch_idf = _idf_lit(df_of[t])
        branch_qids = F.array(*[F.lit(qid) for qid, tt in qterms if tt == t])
        idf_expr = (
            F.when(cond, branch_idf)
            if idf_expr is None
            else idf_expr.when(cond, branch_idf)
        )
        qids_expr = (
            F.when(cond, branch_qids)
            if qids_expr is None
            else qids_expr.when(cond, branch_qids)
        )
    if idf_expr is None:  # no query term occurs in the corpus
        idf_expr = F.lit(None).cast("double")
        qids_expr = F.lit(None).cast("array<bigint>")

    contrib = (
        postings.withColumn("idf", idf_expr)
        .select(
            id_col,
            "tf",
            "dl",
            "idf",
            F.explode(qids_expr).alias("query_id"),
        )
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
