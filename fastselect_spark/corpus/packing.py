"""Sequence packing — the GPT-style concat-and-chunk step that turns a
deduped, filtered corpus into fixed-size training windows: documents are
concatenated in a deterministic order and split into ``max_tokens``-sized
chunks (documents MAY span a chunk boundary — the standard pretraining
packing; padding waste is zero by construction).

Output is a PACK MANIFEST, not the token stream: for every document,
which chunk its first token lands in, at what offset, and which chunk
its last token lands in. A downstream tokenizer worker can materialize
any chunk from the manifest alone (read the listed docs, slice by
offset) — so the heavy token bytes never shuffle here.

Scale shape: a single global concatenation order would be one
single-partition window (the orderBy().limit() trap). Packing is instead
SHARDED: docs are hash-bucketed into ``n_shards`` independent streams,
each shard packs its own chunk sequence (one hash exchange + per-shard
window cumsum), and chunk ids are (shard, local_chunk) pairs. Sharded
packing is what training pipelines do anyway — data-parallel workers
each consume their own shard's chunks. Every quantity is exact integer
arithmetic over a deterministic order, so the DuckDB gate recomputes the
manifest bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastselect_spark.corpus.sampling import _hash_bucket


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
    cost_col: str | None = None,
) -> DataFrame:
    """Pack manifest: (doc_id, shard, n_tokens, start_chunk, start_offset,
    end_chunk) per document.

    - ``shard`` — deterministic hash bucket of the id (same 60-bit md5
      family as the samplers, so the DuckDB oracle reproduces it);
    - docs concatenate within a shard in ascending ``id_col`` order;
    - ``start_chunk``/``start_offset`` — chunk index (0-based within the
      shard) and token offset where the doc's first token lands;
    - ``end_chunk`` — chunk holding the doc's last token (> start_chunk
      when the doc spans boundaries). Tokens = whitespace tokens of the
      normalized text (the repo-wide tokenization), or — when
      ``cost_col`` names a precomputed per-doc token-count column (a real
      BPE tokenizer's counts) — that column, so the manifest reflects the
      actual training token cost."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if cost_col is not None:
        toks = F.col(cost_col)
    else:
        norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
        toks = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    base = df.select(
        F.col(id_col),
        (_hash_bucket(F.col(id_col), seed) % n_shards).alias("shard"),
        toks.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(prev / max_tokens).cast("long").alias("start_chunk"),
        (prev % max_tokens).cast("long").alias("start_offset"),
        F.floor(
            (prev + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / max_tokens
        ).cast("long").alias("end_chunk"),
    )


def truncate_to_token_budget(
    tr: DataFrame,
    budget_tokens: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    keep: str = "suffix",
    cost_col: str | None = None,
) -> DataFrame:
    """Context-window fitting: keep each conversation's SUFFIX (default —
    the most recent turns, the SFT convention) or PREFIX whose cumulative
    whitespace-token count stays within ``budget_tokens`` (a turn is kept
    only if it fits ENTIRELY — strict fit, so a single over-budget turn
    drops out rather than truncating mid-turn). ``cost_col`` optionally
    names a precomputed per-turn token-count column (a real tokenizer's
    counts) to use instead of the whitespace proxy.

    One running-sum window on the shared conv_id exchange; exact integer
    token counts — deterministic under any partitioning."""
    if keep not in ("suffix", "prefix"):
        raise ValueError("keep must be 'suffix' or 'prefix'")
    order = F.desc(order_col) if keep == "suffix" else F.asc(order_col)
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if cost_col is not None:
        nt = F.col(cost_col).cast("long")
    else:
        nt = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    return (
        tr.withColumn("__cum", F.sum(nt).over(w))
        .where(F.col("__cum") <= budget_tokens)
        .drop("__cum")
    )
