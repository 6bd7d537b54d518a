"""CCNet-style language-model perplexity filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data").

CCNet scores every document with the perplexity of a language model
trained on a high-quality reference corpus (Wikipedia in the paper) and
splits each language's corpus into head / middle / tail perplexity
tertiles; training pipelines then keep the head (and sometimes middle).

This is the hashed re-expression of that recipe (KenLM is out of scope —
no native deps in this environment, and the hashed-bag approximation is
the same device the DSIR paper applies to n-gram features): the LM is an
add-k smoothed unigram-occurrence distribution over ``n_buckets`` hashed
token buckets fit on the reference corpus with ONE tree-reduced scan
(corpus/dsir.py machinery, portable 60-bit md5 bucket family), and

    mean_lp(doc) = (1/n) Σ_tokens log p_ref(bucket(token))
    ppl(doc)     = exp(−mean_lp)

Scale shape: fit is one shuffle-free tree reduction; scoring is ONE
row-local broadcast scan (zero shuffles, narrow output). The tertile
split ranks per language — CCNet's own sharding unit — with an ntile
window; for a single mega-language at 100 TB swap the window for the
histogram-threshold split of corpus/dsir.py ``dsir_select_top`` (exact,
no global-sort funnel).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastselect_spark.corpus.dsir import _doc_buckets, hashed_ngram_distribution


def lm_perplexity(
    raw: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *passthrough, n_tokens, ppl): hashed-unigram LM perplexity of
    every raw doc under the reference distribution. ``ppl`` is unrounded
    float64 — round engine-side in contract queries (CLAUDE.md)."""
    p_ref = hashed_ngram_distribution(
        reference, text_col, shingle_k=1, n_buckets=n_buckets, smoothing=smoothing
    )
    logp = np.log(p_ref)
    bc = raw.sparkSession.sparkContext.broadcast(logp)
    passthrough = list(passthrough_cols)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            n_toks, ppls = [], []
            for t in pdf[text_col]:
                b = _doc_buckets(t, 1, n_buckets)
                n_toks.append(len(b))
                ppls.append(float(np.exp(-(lp[b].sum() / len(b)))))
            out = {id_col: pdf[id_col]}
            for c in passthrough:
                out[c] = pdf[c]
            out["n_tokens"] = pd.Series(n_toks, dtype="int64")
            out["ppl"] = ppls
            yield pd.DataFrame(out)

    schema_extra = "".join(
        f", `{c}` {t}"
        for c, t in zip(
            passthrough,
            [dict(raw.dtypes)[c] for c in passthrough],
        )
    )
    return raw.select(id_col, *passthrough, text_col).mapInPandas(
        score,
        schema=f"`{id_col}` long{schema_extra}, n_tokens long, ppl double",
    )


def perplexity_tertiles(
    raw: DataFrame,
    reference: DataFrame,
    lang_col: str = "lang",
    round_decimals: int = 6,
    **kwargs,
) -> DataFrame:
    """(id, lang, n_tokens, ppl, tier): CCNet head/middle/tail split,
    per language, ranked on the ROUNDED perplexity (then id) so
    cross-engine float ulp noise cannot move a doc across a tertile
    boundary."""
    scored = lm_perplexity(
        raw, reference, passthrough_cols=(lang_col,), **kwargs
    ).withColumn("ppl", F.round("ppl", round_decimals))
    id_col = scored.columns[0]
    w = Window.partitionBy(lang_col).orderBy("ppl", id_col)
    return (
        scored.withColumn("__nt", F.ntile(3).over(w))
        .withColumn(
            "tier",
            F.when(F.col("__nt") == 1, "head")
            .when(F.col("__nt") == 2, "middle")
            .otherwise("tail"),
        )
        .drop("__nt")
    )
