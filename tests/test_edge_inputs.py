"""Edge inputs through the pipeline operators: nulls, empties, single
tokens, no-pair graphs — the shapes real crawled corpora are full of."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def messy_docs(spark):
    rows = [
        {"doc_id": 0, "text": None},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "   "},
        {"doc_id": 3, "text": "single"},
        {"doc_id": 4, "text": "two tokens"},
        {"doc_id": 5, "text": "a b c d e normal document here"},
        {"doc_id": 6, "text": "a b c d e normal document here"},  # exact dup
        {"doc_id": 7, "text": "tab\tand\nnewline   spacing"},
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows), "doc_id long, text string"
    )


def test_minhash_handles_null_and_short_texts(messy_docs):
    from fastselect_spark.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(messy_docs, threshold=0.9).toPandas()
    got = {tuple(sorted(t)) for t in zip(pairs["id_a"], pairs["id_b"])}
    # the exact dup pair must surface; degenerate docs must not crash.
    assert (5, 6) in got
    # null/empty/whitespace all normalize to "" -> identical single-shingle
    # docs; they may legitimately pair with each other but not with real text
    for a, b in got:
        if a in (0, 1, 2) or b in (0, 1, 2):
            assert a in (0, 1, 2) and b in (0, 1, 2)


def test_simhash_handles_null_and_short_texts(messy_docs):
    from fastselect_spark.dedup import simhash_near_duplicates

    pairs = simhash_near_duplicates(messy_docs, max_hamming=0).toPandas()
    got = {tuple(sorted(t)) for t in zip(pairs["id_a"], pairs["id_b"])}
    assert (5, 6) in got  # identical docs -> identical signature


def test_ngram_jaccard_handles_messy(messy_docs):
    from fastselect_spark.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(messy_docs, threshold=0.99).toPandas()
    got = {tuple(sorted(t)) for t in zip(pairs["id_a"], pairs["id_b"])}
    assert (5, 6) in got


def test_connected_components_empty_graph(spark):
    from fastselect_spark.dedup import connected_components, duplicate_clusters

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    assert duplicate_clusters(empty).count() == 0


def test_text_stats_null_text(messy_docs):
    from fastselect_spark.text import add_language_id, add_quality_score, add_token_count

    out = add_token_count(messy_docs).toPandas()
    assert len(out) == 8  # no rows dropped
    # null text behaves like empty text: counts defined, never null
    assert out["n_ws_tokens"].notna().all()
    assert out["n_bpe_tokens"].notna().all()
    q = add_quality_score(messy_docs).toPandas()
    assert q["quality_score"].between(0, 1).all()
    lang = add_language_id(messy_docs).toPandas()
    assert len(lang) == 8


def test_corpus_sample_degenerate_fractions(messy_docs):
    from fastselect_spark.corpus import deterministic_sample

    assert deterministic_sample(messy_docs, 0.0).count() == 0
    assert deterministic_sample(messy_docs, 1.0).count() == 8


def test_cap_per_source_under_quota(spark):
    from fastselect_spark.corpus import cap_per_source

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "source": ["s", "s"]})
    )
    out = cap_per_source(df, quota=10, source_col="source").toPandas()
    assert len(out) == 2  # quota larger than group: everything kept
    assert sorted(out["source_rank"]) == [1, 2]


def test_dedup_exact_ties_and_empties(messy_docs):
    """Documented NULL-text semantics: SQL grouping — null text is its own
    group (doc 0 survives alone), empty/whitespace texts collapse together
    (1 survives, 2 dropped), exact dup 6 collapses into 5."""
    from fastselect_spark.dedup import dedup_exact

    out = set(dedup_exact(messy_docs).toPandas()["doc_id"])
    assert 0 in out and 1 in out and 5 in out
    assert 2 not in out and 6 not in out


def test_minhash_kernel_shingles_match_jvm(spark):
    """The md5-family signature shingles in PYTHON (Arrow kernel) while
    verification shingles in JVM (_shingles): the two tokenizations must
    agree or banding and verification silently diverge. Compare on the
    whitespace/edge shapes that differ between regex engines."""
    import pandas as pd

    from fastselect_spark.dedup.minhash import _shingles
    from pyspark.sql import functions as F

    texts = [
        "a b c d e",
        "  leading and trailing  ",
        "tab\tseparated\ttokens here",
        "line\nbreaks\nand\rcarriage returns",
        "multiple    internal     runs",
        "single",
        "",
        "UPPER Case MiXeD tokens",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    jvm = {
        r.doc_id: set(r.sh)
        for r in df.select(
            "doc_id", _shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }

    import re

    def py_shingles(t, k=3):
        norm = re.sub(r"\s+", " ", (t or "").strip()).lower()
        toks = norm.split(" ")
        if len(toks) >= k:
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return {norm}

    for i, t in enumerate(texts):
        assert jvm[i] == py_shingles(t), f"shingle mismatch for text {t!r}"
