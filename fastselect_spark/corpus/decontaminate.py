"""Benchmark decontamination — remove training documents that overlap a
held-out evaluation/benchmark set (the GPT-3/PaLM-style n-gram
decontamination rule: a training doc sharing enough distinct token
n-grams with any benchmark text is contaminated and must be dropped
before training).

Spark shape at 100 TB: the benchmark side is small by definition (eval
sets are thousands of texts, not billions), so its DISTINCT shingle set
is broadcast; the corpus side is ONE scan exploding each doc's distinct
shingles, a broadcast hash semi-join on the shingle, and one per-doc
aggregation — no shuffle of the corpus beyond the final per-doc count,
no O(corpus × benchmark) pair work. Tokenization is the SAME
``_shingles`` expression the dedup family uses (whitespace-normalized
lowercase token k-shingles), so the DuckDB gate recomputes it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.dedup.minhash import _shingles


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, n_hit_shingles, n_shingles, hit_frac) for every corpus doc
    sharing at least one distinct ``shingle_k``-gram with the benchmark.

    ``hit_frac`` is the contaminated fraction of the DOC's shingle set —
    the thresholding knob: 1.0 means every n-gram of the doc appears
    somewhere in the benchmark (verbatim leak); small fractions are
    incidental phrase overlap."""
    bench_text = bench_text_col or text_col
    bench_shingles = (
        benchmark.select(
            F.explode(_shingles(F.col(bench_text), shingle_k)).alias("shingle")
        ).distinct()
    )
    # per-doc distinct shingles; n_shingles rides the explode (narrow int).
    # ensure_parallelism: a single-file corpus otherwise runs the whole
    # shingle explode as ONE task (round-3 lesson; measured 5.7s -> <1s
    # for the sf0.1 scan)
    from fastselect_spark.dedup.minhash import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    # STAGE the shingle array and its size BELOW the explode (the bm25
    # `dl` shape): with size() and explode() over the raw expression in
    # ONE select, Catalyst placed size(+ the full shingling) in the
    # projection ABOVE the Generate — recomputing the entire shingle
    # expression PER EXPLODED TOKEN ROW (measured 15-25x on a bare scan).
    # Computing n_shingles in the Generate's CHILD carries one int per
    # exploded row instead (carrying the array itself through the
    # Generate copies it per row — O(tokens²) bytes).
    inv = (
        corpus.select(
            F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("__sh")
        )
        .select(F.col(id_col), F.size("__sh").alias("n_shingles"), "__sh")
        .select(
            F.col(id_col), "n_shingles", F.explode("__sh").alias("shingle")
        )
    )
    hits = (
        inv.join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_shingles"),
            F.first("n_shingles").alias("n_shingles"),
        )
    )
    return hits.select(
        id_col,
        F.col("n_hit_shingles").cast("long").alias("n_hit_shingles"),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.round(
            F.col("n_hit_shingles") / F.col("n_shingles"), 6
        ).alias("hit_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    shingle_k: int = 3,
    min_hit_shingles: int = 1,
    min_hit_frac: float = 0.0,
) -> DataFrame:
    """The kept corpus: drop docs whose benchmark overlap reaches BOTH
    thresholds (``min_hit_shingles`` distinct shared n-grams AND
    ``min_hit_frac`` of the doc's own shingles — the fraction guard stops
    one common phrase from nuking long documents)."""
    hits = contamination_hits(
        corpus, benchmark, text_col, id_col, bench_text_col, shingle_k
    )
    bad = hits.where(
        (F.col("n_hit_shingles") >= min_hit_shingles)
        & (F.col("hit_frac") >= min_hit_frac)
    ).select(id_col)
    return corpus.join(bad, id_col, "left_anti")


def novelty_scores(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, n_shingles, n_seen, novelty) for EVERY corpus doc with at
    least one shingle — ``novelty`` is the fraction of the doc's distinct
    ``shingle_k``-grams ABSENT from the reference corpus: the freshness
    score for training-mixture planning (novelty ≈ 0 means the doc is
    phrase-level redundant with what the model already saw; the
    complement of contamination_hits' hit_frac, but emitted for no-hit
    docs too). Two corpus scans (the hit join + the per-doc shingle
    count); the reference shingle set is broadcast, same as
    decontaminate."""
    hits = contamination_hits(
        corpus, reference, text_col, id_col, ref_text_col, shingle_k
    )
    base = corpus.select(
        F.col(id_col),
        F.size(_shingles(F.col(text_col), shingle_k))
        .cast("long")
        .alias("n_shingles"),
    ).where(F.col("n_shingles") > 0)
    j = base.join(
        hits.select(id_col, "n_hit_shingles"), id_col, "left"
    )
    n_seen = F.coalesce(F.col("n_hit_shingles"), F.lit(0)).cast("long")
    return j.select(
        id_col,
        "n_shingles",
        n_seen.alias("n_seen"),
        (
            F.lit(1.0)
            - n_seen.cast("double") / F.col("n_shingles").cast("double")
        ).alias("novelty"),
    )


def bloom_contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    shingle_k: int = 3,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter variant of :func:`contamination_hits`: the benchmark
    side is compressed to a FIXED-size bit set (``k_hashes`` salted-md5
    positions per shingle modulo ``m_bits``) instead of its full distinct
    shingle table. A corpus shingle counts as a hit when ALL of its k
    positions are set — one-sided error: every true overlap is found,
    plus a bounded false-positive rate ~(1 - e^{-kn/m})^k, so the screen
    never MISSES contamination; flagged docs go to the exact check.

    Why at 100 TB: a billion-shingle benchmark's distinct-shingle
    broadcast is tens of GB; the bit set is m_bits/8 bytes regardless
    (128 KiB at the default), so the corpus-side scan stays one
    broadcast-join pass whatever the benchmark grows to. The position
    table IS the bit set (distinct ints < m_bits) — the packed-bitarray
    form is an executor-local representation of the same set, so the
    semantics (and the DuckDB oracle) are exactly this join.

    Returns (doc_id, n_shingles, n_hit_shingles, flagged int) — counts
    are over the doc's DISTINCT shingles; upper-bounds the exact
    ``contamination_hits`` counts."""
    if m_bits < 2 or k_hashes < 1:
        raise ValueError(f"need m_bits >= 2, k_hashes >= 1; got {m_bits}, {k_hashes}")
    from fastselect_spark.dedup.minhash import ensure_parallelism

    bench_text = bench_text_col or text_col
    bench_sh = ensure_parallelism(benchmark).select(
        F.explode(_shingles(F.col(bench_text), shingle_k)).alias("shingle")
    ).distinct()
    pos_exprs = [
        F.expr(
            f"CAST(conv(substring(md5(CONCAT('{j}:', shingle)), 1, 15), 16, 10)"
            f" AS BIGINT) % {m_bits}"
        ).alias("pos")
        for j in range(k_hashes)
    ]
    # materialize the bit set ONCE: each broadcast build is a different
    # projection of this frame, so without the checkpoint the bench
    # shingle+hash+distinct plan re-executes per semi-join (only identical
    # Exchanges are reused)
    bits = (
        bench_sh.select(F.explode(F.array(*[e for e in pos_exprs])).alias("pos"))
        .distinct()
        .localCheckpoint()
    )
    # staged array + size below the explode — see contamination_hits:
    # size()+explode() over the raw expression recomputes the whole
    # shingling per exploded row otherwise
    inv = (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("__sh")
        )
        .select(F.col(id_col), F.size("__sh").alias("n_shingles"), "__sh")
        .select(
            F.col(id_col), "n_shingles", F.explode("__sh").alias("shingle")
        )
    )
    # "all k positions set" as k successive BROADCAST LEFT SEMI joins —
    # the probe stream is filtered in place, never re-grouped by the
    # shingle string (the first cut grouped (doc, shingle) over a k-row
    # posexplode: an extra wide-string exchange that measured ~9x the
    # exact variant at sf0.1; the semi-join chain removes it)
    probe = inv.select(
        id_col,
        "n_shingles",
        *[e.alias(f"__p{j}") for j, e in enumerate(pos_exprs)],
    )
    for j in range(k_hashes):
        side = bits.select(F.col("pos").alias(f"__p{j}"))
        probe = probe.join(F.broadcast(side), f"__p{j}", "left_semi")
    return (
        probe.groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_hit_shingles"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hit_shingles",
            F.lit(1).alias("flagged"),
        )
    )
