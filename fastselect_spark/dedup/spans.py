"""Duplicate-span removal: C4-style global substring deduplication.

The C4 pipeline (Raffel et al., "Exploring the Limits of Transfer Learning
with a Unified Text-to-Text Transformer", §2.2) removes every occurrence
but the first of any three-sentence span that appears more than once in
the corpus.  This operator is the token-window adaptation for corpora
without sentence structure: text is normalized (lower, whitespace-collapse)
and chunked into consecutive non-overlapping ``span_tokens``-token spans
(the tail span may be shorter); for every distinct span string the single
globally-first occurrence — minimum ``(doc_id, position)`` — is kept and
all other occurrences are dropped; each document's surviving spans are
re-joined in their original order.

Scale shape (the plan you want at 100 TB):

- tokenize + chunk is a narrow projection (no shuffle);
- first-occurrence election is ONE hash exchange on the span string
  (a ``row_number`` window partitioned by the span itself — equal spans
  hash-collide by construction, so no separate fingerprint column or
  join-back pass is needed, and the span text crosses the wire exactly
  once);
- document reassembly is ONE exchange on ``doc_id``.

Two shuffles total, both on natural keys; no self-join, no all-pairs
stage.  Exact duplicates are subsumed (every span of a later exact copy
loses), so running :func:`dedup_exact` first is an optimization, not a
correctness requirement.

Empty/NULL text normalizes to one empty span, so all blank documents
collapse onto the single earliest blank one — same convention as the
near-dup family (minhash/simhash null handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_tokens(text_col: str):
    """lower → trim → collapse whitespace → split on single spaces."""
    return F.split(
        F.regexp_replace(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "),
        " ",
    )


def explode_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
) -> DataFrame:
    """(id, pos, span): consecutive ``span_tokens``-token windows per doc.

    Narrow (no exchange): tokenize, chunk with a higher-order ``transform``
    over span indices, ``posexplode``.  The tail chunk keeps the remainder
    tokens so the concatenation of a doc's spans is exactly its normalized
    text.
    """
    toks = _norm_tokens(text_col)
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda g: F.concat_ws(" ", F.slice(toks, g * span_tokens + 1, span_tokens)),
    )
    return df.select(
        F.col(id_col), F.posexplode(spans).alias("pos", "span")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
) -> DataFrame:
    """Per doc: (id, n_spans, n_kept, text_dedup) after global span dedup.

    ``text_dedup`` is the doc's surviving spans joined with single spaces
    ('' when every span was a duplicate of an earlier occurrence).
    """
    spans = explode_spans(df, text_col, id_col, span_tokens)
    w = Window.partitionBy("span").orderBy(id_col, "pos")
    ranked = spans.withColumn("__rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("__rn") == 1, F.struct(F.col("pos"), F.col("span"))
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("__rn") == 1).cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["span"],
                ),
            ).alias("text_dedup"),
        )
    )
