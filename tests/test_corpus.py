"""Corpus-management ops: deterministic sampling, source mixing, quotas."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastselect_spark.corpus import (
    cap_per_source,
    deterministic_sample,
    sample_by_source,
)


def _h(seed: int, key) -> int:
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16) % 1_000_000


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        {"doc_id": i, "source": f"s{i % 4}", "n_chars": (i * 37) % 500}
        for i in range(400)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_deterministic_sample_matches_hash_rule(corpus):
    out = deterministic_sample(corpus, 0.3, key_col="doc_id", seed=5).toPandas()
    expect = {i for i in range(400) if _h(5, i) < 300_000}
    assert set(out["doc_id"]) == expect
    # ~30% within binomial noise
    assert 0.2 < len(expect) / 400 < 0.4


def test_deterministic_sample_repartition_stable(corpus):
    a = set(
        deterministic_sample(corpus, 0.5, seed=9).toPandas()["doc_id"]
    )
    b = set(
        deterministic_sample(corpus.repartition(13), 0.5, seed=9).toPandas()["doc_id"]
    )
    assert a == b  # rand()-based sampling would differ here


def test_sample_by_source_rates(corpus):
    out = sample_by_source(
        corpus,
        {"s0": 1.0, "s1": 0.0},
        source_col="source",
        key_col="doc_id",
        seed=3,
        default_fraction=0.5,
    ).toPandas()
    by_src = out.groupby("source").size().to_dict()
    assert by_src.get("s0") == 100  # fraction 1.0 keeps everything
    assert "s1" not in by_src  # fraction 0.0 keeps nothing
    for s in ("s2", "s3"):
        expect = sum(
            1 for i in range(400) if f"s{i % 4}" == s and _h(3, i) < 500_000
        )
        assert by_src.get(s, 0) == expect


def test_cap_per_source(corpus):
    out = cap_per_source(
        corpus, quota=7, source_col="source",
        order_by=[F.col("n_chars").desc()], key_col="doc_id",
    ).toPandas()
    assert out.groupby("source").size().max() == 7
    assert set(out["source_rank"]) == set(range(1, 8))
    # per source, the kept docs are exactly the 7 largest by (n_chars, -doc_id)
    pdf = corpus.toPandas()
    for s, grp in pdf.groupby("source"):
        top = grp.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(7)
        assert set(out[out.source == s]["doc_id"]) == set(top["doc_id"])


def test_validation_errors(corpus):
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(corpus, 1.5)
    with pytest.raises(ValueError, match="fraction"):
        sample_by_source(corpus, {"s0": -0.1})
    with pytest.raises(ValueError, match="quota"):
        cap_per_source(corpus, quota=0)


def test_deterministic_sample_nested(corpus):
    """Same-seed samples are nested: sample(f1) ⊆ sample(f2) for f1<=f2 —
    the scaling-ladder property (1% -> 10% -> 100% supersets)."""
    s10 = set(deterministic_sample(corpus, 0.1, seed=21).toPandas()["doc_id"])
    s30 = set(deterministic_sample(corpus, 0.3, seed=21).toPandas()["doc_id"])
    s100 = set(deterministic_sample(corpus, 1.0, seed=21).toPandas()["doc_id"])
    assert s10 <= s30 <= s100
    assert len(s100) == 400


def test_quality_filter_rules(spark):
    from fastselect_spark.corpus import quality_filter

    rows = [
        {"doc_id": 0, "text": "the cat is on the mat and it is a very nice mat indeed today"},
        {"doc_id": 1, "text": "zzz qqq xxx yyy www vvv uuu ttt sss rrr"},  # und, no stopwords
        {"doc_id": 2, "text": "short"},                                     # too few tokens
        {"doc_id": 3, "text": None},                                        # null
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), "doc_id long, text string")
    kept = quality_filter(
        df, langs=("en",), min_quality=0.0, min_stopword_ratio=0.05, min_tokens=5
    ).toPandas()
    assert set(kept["doc_id"]) == {0}
    # scoring columns present for auditability
    for c in ("lang_pred", "quality_score", "stopword_ratio", "n_ws_tokens"):
        assert c in kept.columns
    # disabling the language rule admits the non-English doc iff other rules pass
    kept2 = quality_filter(
        df, langs=None, min_quality=0.0, min_stopword_ratio=0.0, min_tokens=5
    ).toPandas()
    assert set(kept2["doc_id"]) == {0, 1}


def test_decontaminate_planted(spark):
    """Verbatim benchmark leak (hit_frac 1.0) is dropped, partial phrase
    overlap is kept under the fraction guard, clean docs untouched."""
    from pyspark.sql import functions as F

    from fastselect_spark.corpus import contamination_hits, decontaminate

    bench = spark.createDataFrame(
        [(9000, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim copy of the benchmark text -> hit_frac 1.0
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # shares one 3-gram ('the quick brown') out of many -> small frac
            (2, "meanwhile the quick brown cat sat on a very warm mat today"),
            # clean
            (3, "completely unrelated text about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    hits = {
        r["doc_id"]: (r["n_hit_shingles"], r["hit_frac"])
        for r in contamination_hits(corpus, bench).collect()
    }
    assert hits[1][1] == 1.0
    assert 3 not in hits
    assert 0 < hits[2][1] < 0.5
    kept = decontaminate(
        corpus, bench, min_hit_shingles=1, min_hit_frac=0.5
    )
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [2, 3]
    # threshold at any overlap drops both overlapping docs
    kept_strict = decontaminate(corpus, bench, min_hit_shingles=1)
    assert [r["doc_id"] for r in kept_strict.select("doc_id").collect()] == [3]
    # plan: the benchmark side must broadcast (no corpus shuffle for the join)
    plan = contamination_hits(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_planted(spark):
    """Gopher repetition signals against hand-computed values, including
    the line metrics the synthetic corpus can't exercise (it has no
    newlines) and the deterministic mode tie-break."""
    from fastselect_spark.text import add_repetition_stats, repetition_filter

    docs = spark.createDataFrame(
        [
            # 4 lines, 'spam line' repeated 3x -> dup_line_frac = 2/4
            (1, "spam line\nspam line\nspam line\nreal content here"),
            # heavy 2-gram repetition: 'buy now' x4 in 8 tokens
            (2, "buy now buy now buy now buy now"),
            # clean prose
            (3, "a perfectly ordinary sentence with distinct tokens only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in add_repetition_stats(docs).collect()
    }
    assert got[1]["n_lines"] == 4
    assert abs(got[1]["dup_line_frac"] - 0.5) < 1e-12
    # doc 2: norm = 'buy now buy now buy now buy now' (31 chars);
    # top 2-gram = 'buy now' (count 4, len 7) -> 28/31; dup words 6/8
    assert abs(got[2]["top2gram_char_frac"] - 28 / 31) < 1e-12
    assert abs(got[2]["dup_word_frac"] - 0.75) < 1e-12
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["dup_word_frac"] == 0.0
    kept = repetition_filter(docs)
    assert [r["doc_id"] for r in kept.select("doc_id").collect()] == [3]


def test_pack_sequences_manifest(spark):
    """The manifest reconstructs a gapless token stream per shard: doc k's
    first token lands exactly one past doc k-1's last token, offsets stay
    under max_tokens, and chunk spans match ceil-div arithmetic."""
    from pyspark.sql import functions as F

    from fastselect_spark.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (7 + (i * 13) % 40))) for i in range(200)],
        "doc_id long, text string",
    )
    m = pack_sequences(docs, max_tokens=64, n_shards=3).toPandas()
    assert len(m) == 200
    assert (m["start_offset"] < 64).all()
    assert (m["end_chunk"] >= m["start_chunk"]).all()
    for _, grp in m.sort_values(["shard", "doc_id"]).groupby("shard"):
        pos = 0
        for r in grp.itertuples():
            assert r.start_chunk == pos // 64
            assert r.start_offset == pos % 64
            assert r.end_chunk == (pos + max(r.n_tokens - 1, 0)) // 64
            pos += r.n_tokens


def test_tfidf_keywords_oracle(spark):
    """tf-idf top-k against a pure-Python oracle (smoothed sklearn idf,
    (score desc, term asc) tie-break) on a planted mini-corpus."""
    import math

    from fastselect_spark.text import top_tfidf_terms

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "apple elderberry elderberry elderberry"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["rank"], r["term"], r["tf"], r["df"], r["score"])
        for r in top_tfidf_terms(docs, k=2).orderBy("doc_id", "rank").collect()
    ]
    # python oracle
    from collections import Counter
    n = 3
    tfs = {d: Counter(t.split()) for d, t in rows}
    dfs = Counter(term for c in tfs.values() for term in c)
    expect = []
    for d in sorted(tfs):
        scored = sorted(
            (
                (-tf * (math.log((n + 1) / (dfs[t] + 1)) + 1), t, tf)
                for t, tf in tfs[d].items()
            )
        )[:2]
        for rank, (neg, t, tf) in enumerate(scored, 1):
            expect.append((d, rank, t, tf, dfs[t], round(-neg, 6)))
    assert got == expect


# ---------- DSIR importance weighting ----------

@pytest.fixture(scope="module")
def dsir_corpus(spark):
    """Planted two-dialect corpus: target speaks 'alpha', half the raw
    pool speaks 'alpha', the other half speaks 'beta'."""
    alpha = "the alpha model trains on clean curated text data"
    beta = "zzq wvx qqj kxv jjz vqk xxw zvj qzz wkx"
    rows = [{"doc_id": i, "text": alpha, "kind": "target"} for i in range(0, 20)]
    rows += [{"doc_id": 100 + i, "text": alpha, "kind": "raw_alpha"} for i in range(20)]
    rows += [{"doc_id": 200 + i, "text": beta, "kind": "raw_beta"} for i in range(20)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_dsir_logweights_separate_dialects(dsir_corpus):
    """Raw docs matching the target dialect must outscore off-dialect docs."""
    from fastselect_spark.corpus import dsir_logweights

    target = dsir_corpus.where(F.col("kind") == "target")
    raw = dsir_corpus.where(F.col("kind") != "target")
    w = dsir_logweights(raw, target, n_buckets=1000).toPandas()
    assert len(w) == 40
    alpha_w = w.loc[w["doc_id"] < 200, "logw"]
    beta_w = w.loc[w["doc_id"] >= 200, "logw"]
    assert alpha_w.min() > beta_w.max()
    assert (alpha_w > 0).all() and (beta_w < 0).all()


def test_dsir_select_top_exact_rank(dsir_corpus):
    """dsir_select_top's histogram-threshold selection equals the pandas
    (logw DESC, doc_id ASC) top-N on the same weights, at a fraction that
    forces the boundary-bucket remainder path."""
    from fastselect_spark.corpus import dsir_logweights, dsir_select_top

    target = dsir_corpus.where(F.col("kind") == "target")
    raw = dsir_corpus.where(F.col("kind") != "target")
    kept = dsir_select_top(raw, target, fraction=0.25, n_buckets=1000).toPandas()
    w = dsir_logweights(raw, target, n_buckets=1000).toPandas()
    want = set(
        w.sort_values(["logw", "doc_id"], ascending=[False, True])
        .head(int(round(len(w) * 0.25)))["doc_id"]
    )
    assert set(kept["doc_id"]) == want


# ---------- CCNet perplexity filter ----------

def test_lm_perplexity_dialect_separation(dsir_corpus):
    """Docs in the reference dialect score lower perplexity than
    off-dialect docs; values match a NumPy replica of the hashed LM."""
    import hashlib

    from fastselect_spark.corpus import lm_perplexity

    ref = dsir_corpus.where(F.col("kind") == "target")
    out = lm_perplexity(dsir_corpus, ref, n_buckets=1000).toPandas()
    assert len(out) == 60
    alpha = out.loc[out["doc_id"] < 200, "ppl"]
    beta = out.loc[out["doc_id"] >= 200, "ppl"]
    assert alpha.max() < beta.min()

    # NumPy replica for one alpha doc
    alpha_text = "the alpha model trains on clean curated text data"
    toks = alpha_text.split(" ")
    bucket = lambda g: int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 1000
    cnt = np.zeros(1000)
    for t in toks:
        cnt[bucket(t)] += 20  # 20 identical reference docs
    p = (cnt + 1.0) / (cnt.sum() + 1000.0)
    mean_lp = np.mean([np.log(p[bucket(t)]) for t in toks])
    np.testing.assert_allclose(
        out.loc[out["doc_id"] == 0, "ppl"].iloc[0], np.exp(-mean_lp), rtol=1e-12
    )


def test_perplexity_tertiles_balanced(dsir_corpus):
    from fastselect_spark.corpus import perplexity_tertiles

    ref = dsir_corpus.where(F.col("kind") == "target")
    docs = dsir_corpus.withColumn("lang", F.lit("xx"))
    out = perplexity_tertiles(docs, ref, lang_col="lang").toPandas()
    counts = out["tier"].value_counts()
    assert counts["head"] == 20 and counts["middle"] == 20 and counts["tail"] == 20
    # all beta docs (high ppl) land in the tail
    assert (out.loc[out["doc_id"] >= 200, "tier"] == "tail").all()


# ---------- quality classifier ----------

def test_quality_classifier_separates_dialects(dsir_corpus):
    """Trained on target=alpha labels, alpha docs must score near 1 and
    beta docs near 0."""
    from fastselect_spark.corpus import quality_scores, train_quality_classifier

    labeled = dsir_corpus.withColumn(
        "label", (F.col("kind") != "raw_beta").cast("double")
    )
    w = train_quality_classifier(labeled, n_buckets=512, iterations=50, lr=2.0)
    s = quality_scores(dsir_corpus, w).toPandas()
    alpha = s.loc[s["doc_id"] < 200, "clf_score"]
    beta = s.loc[s["doc_id"] >= 200, "clf_score"]
    # imbalanced planted labels (2:1) keep beta off zero at 50 iterations;
    # the separation margin is the real claim
    assert alpha.min() > 0.8
    assert beta.max() < 0.35
    assert alpha.min() - beta.max() > 0.6


def test_quality_classifier_numpy_replica_parity(dsir_corpus, tmp_path):
    """The distributed trainer and the single-process replica must agree
    to float-reduction noise (same init/iterations/lr/label rule)."""
    import numpy as np

    from fastselect_spark.corpus import (
        train_quality_classifier,
        train_quality_classifier_numpy,
    )

    pq_path = str(tmp_path / "docs.parquet")
    dsir_corpus.select("doc_id", "text").toPandas().to_parquet(pq_path)
    labeled = dsir_corpus.withColumn(
        "label", (F.col("doc_id") % 7 == 0).cast("double")
    )
    w_spark = train_quality_classifier(labeled, n_buckets=256, iterations=10)
    w_np = train_quality_classifier_numpy(
        pq_path, label_mod=7, n_buckets=256, iterations=10
    )
    np.testing.assert_allclose(w_spark, w_np, atol=1e-10)


def test_vocab_topk_oracle(spark):
    """Vocabulary/Zipf statistics against a pure-Python oracle on a
    planted mini-corpus: exact counts/doc-freqs, (count desc, term asc)
    rank, and a cumulative coverage curve ending at exactly 1.0 when
    k >= vocabulary size."""
    from collections import Counter

    from fastselect_spark.text import vocab_topk

    rows = [
        (1, "the  cat sat on THE mat"),
        (2, "the dog ate the cat food"),
        (3, "  a mat a plan a canal  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (
            r["term"],
            r["count"],
            r["doc_freq"],
            r["rank"],
            r["share"],
            r["cum_share"],
        )
        for r in vocab_topk(docs, k=50).orderBy("rank").collect()
    ]
    toks = {d: t.lower().split() for d, t in rows}
    counts = Counter(t for ts in toks.values() for t in ts)
    dfreq = Counter(t for ts in toks.values() for t in set(ts))
    total = sum(counts.values())
    expect, cum = [], 0
    order = sorted(counts, key=lambda t: (-counts[t], t))
    for rank, term in enumerate(order, 1):
        cum += counts[term]
        expect.append(
            (
                term,
                counts[term],
                dfreq[term],
                rank,
                round(counts[term] / total, 6),
                round(cum / total, 6),
            )
        )
    assert got == expect
    assert got[-1][-1] == 1.0
    # top-k truncation keeps the same prefix
    top3 = [r["term"] for r in vocab_topk(docs, k=3).orderBy("rank").collect()]
    assert top3 == [t for t, *_ in expect[:3]]


def test_rebalance_classes(spark):
    """Skewed 300/80/20 labels: the majority classes downsample to ~the
    minority count via the documented floor-threshold hash rule (exact
    hashlib replica), the minority class is kept whole, and the result is
    repartition-stable."""
    from fastselect_spark.corpus import rebalance_classes

    rows = [
        {"doc_id": i, "label": "a" if i < 300 else ("b" if i < 380 else "c")}
        for i in range(400)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = rebalance_classes(df, "label", "doc_id", seed=11).toPandas()
    counts = out["label"].value_counts().to_dict()
    assert counts.get("c") == 20  # minority kept whole
    # exact replica of the keep rule
    expect = set()
    for r in rows:
        cnt = {"a": 300, "b": 80, "c": 20}[r["label"]]
        f = 1.0 * 20 / cnt
        t = 1_000_000 if f >= 1.0 else int(f * 1_000_000)
        if _h(11, r["doc_id"]) < t:
            expect.add(r["doc_id"])
    assert set(out["doc_id"]) == expect
    # repartition stability
    out2 = rebalance_classes(df.repartition(7), "label", "doc_id", seed=11)
    assert set(out2.toPandas()["doc_id"]) == expect
    with pytest.raises(ValueError, match="target_ratio"):
        rebalance_classes(df, "label", "doc_id", target_ratio=0.0)


# ---------------------------------------------------------------------------
# sketches: HyperLogLog distinct + count-min frequency


def _py_hll(vals, p):
    """Pure-python replica of corpus/sketches.py hll_distinct."""
    import math

    from fastselect_spark.corpus.sketches import hll_alpha

    m = 1 << p
    wb = 60 - p
    q = wb + 1
    regs: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, w = h % m, h // m
        rho = q if w == 0 else wb + 1 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(1 << (q - r) for r in regs.values()) + (m - len(regs)) * (1 << q)
    raw = (hll_alpha(m) * m * m * float(2**q)) / float(s)
    v0 = m - len(regs)
    if raw <= 2.5 * m and v0 > 0:
        return len(regs), m * math.log(m / v0)
    return len(regs), raw


def test_hll_distinct_python_parity_and_accuracy(spark):
    from fastselect_spark.corpus import hll_distinct

    rows = [(g, f"v{g}{i % n}") for g, n in (("a", 40), ("b", 2500)) for i in range(2 * n)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.g: (r.registers_hit, r.hll_estimate) for r in hll_distinct(df, ["g"], "v", p=8).collect()}
    for g, n in (("a", 40), ("b", 2500)):
        hit, est = _py_hll([f"v{g}{i}" for i in range(n)], 8)
        assert got[g][0] == hit
        assert got[g][1] == est  # bit-identical to the replica
        assert abs(est - n) / n < 0.15  # ~1.04/sqrt(256) standard error


def test_hll_ignores_nulls_and_duplicates(spark):
    from fastselect_spark.corpus import hll_distinct

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("b", None)], "g string, v string"
    )
    out = {r.g: r.registers_hit for r in hll_distinct(df, ["g"], "v", p=4).collect()}
    assert out == {"a": 1}  # all-null group absent; dup collapses to one register


def test_countmin_exact_when_sparse_and_overestimates(spark):
    from fastselect_spark.corpus import countmin_lookup, countmin_sketch

    rows = [(f"k{i % 20}",) for i in range(400)]  # each key appears 20x
    df = spark.createDataFrame(rows, "k string")
    # wide sketch: collisions vanish -> estimates exact
    sk = countmin_sketch(df, "k", depth=4, width=4096)
    keys = spark.createDataFrame([(f"k{i}",) for i in range(20)] + [("absent",)], "k string")
    got = {r.k: r.cm_estimate for r in countmin_lookup(sk, keys, "k", depth=4, width=4096).collect()}
    assert all(got[f"k{i}"] == 20 for i in range(20))
    assert got["absent"] >= 0
    # narrow sketch: estimates never UNDER-estimate
    sk2 = countmin_sketch(df, "k", depth=2, width=8)
    got2 = {r.k: r.cm_estimate for r in countmin_lookup(sk2, keys, "k", depth=2, width=8).collect()}
    assert all(got2[f"k{i}"] >= 20 for i in range(20))


def test_countmin_weighted(spark):
    from fastselect_spark.corpus import countmin_lookup, countmin_sketch

    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "k string, w int")
    sk = countmin_sketch(df, "k", depth=3, width=1024, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {r.k: r.cm_estimate for r in countmin_lookup(sk, keys, "k", depth=3, width=1024).collect()}
    assert got == {"a": 12, "b": 1}


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis-Spirakis races)


def _py_race(seed, key, w):
    import math

    h = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)
    return -math.log((h + 1) / 2.0**60) / w


def test_weighted_sample_python_replica_parity(spark):
    from fastselect_spark.corpus import weighted_sample

    rows = [(i, "g" if i % 2 else "h", float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    got = sorted(
        (r.grp, r.doc_id)
        for r in weighted_sample(df, 10, "w", group_cols=["grp"], seed=5).collect()
    )
    expect = []
    for g in ("g", "h"):
        cand = [(i, w) for i, gg, w in rows if gg == g]
        cand.sort(key=lambda t: (_py_race(5, t[0], t[1]), t[0]))
        expect += [(g, i) for i, _ in cand[:10]]
    assert got == sorted(expect)
    # repartition-stable
    again = sorted(
        (r.grp, r.doc_id)
        for r in weighted_sample(
            df.repartition(13), 10, "w", group_cols=["grp"], seed=5
        ).collect()
    )
    assert again == got


def test_weighted_sample_proportional_inclusion(spark):
    """n=1 inclusion frequency across seeds tracks the weights (the
    Efraimidis-Spirakis guarantee P(win) = w_i / sum w)."""
    from fastselect_spark.corpus import weighted_sample

    df = spark.createDataFrame(
        [(0, 8.0), (1, 1.0), (2, 1.0)], "doc_id long, w double"
    )
    wins = {0: 0, 1: 0, 2: 0}
    for seed in range(120):
        (r,) = weighted_sample(df, 1, "w", seed=seed).collect()
        wins[r.doc_id] += 1
    assert wins[0] > 70  # expectation 96 of 120
    assert wins[1] + wins[2] < 50


def test_weighted_sample_excludes_bad_weights(spark):
    from fastselect_spark.corpus import weighted_sample

    df = spark.createDataFrame(
        [(0, 5.0), (1, 0.0), (2, -3.0), (3, None)], "doc_id long, w double"
    )
    got = [r.doc_id for r in weighted_sample(df, 4, "w").collect()]
    assert got == [0]


def test_weighted_sample_drops_null_keys(spark):
    """A NULL key_col row must be DROPPED, not race (its NULL race key
    sorts first ascending and would deterministically win — round-5
    ADVICE fix), in both grouped and ungrouped paths."""
    from fastselect_spark.corpus import weighted_sample

    df = spark.createDataFrame(
        [(None, "en", 100.0), (1, "en", 100.0), (2, "en", 1.0)],
        "doc_id long, lang string, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, 1, "w", key_col="doc_id").collect()}
    assert None not in got and len(got) == 1
    got_g = {
        r.doc_id
        for r in weighted_sample(
            df, 1, "w", key_col="doc_id", group_cols=["lang"]
        ).collect()
    }
    assert None not in got_g and len(got_g) == 1


def test_prefix_filter_jaccard_equals_uncapped_exact(spark):
    """Prefix filtering returns EXACTLY the uncapped inverted-index result
    (no df cap, no dropped pairs) on a corpus with hot + rare shingles."""
    from fastselect_spark.dedup import ngram_jaccard_pairs, prefix_filter_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    rows = [(i, base + f" tail{i} suffix{i % 3}") for i in range(40)]
    rows += [(100 + i, f"completely different text number {i} with unique words w{i}a w{i}b w{i}c w{i}d") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            df, threshold=0.5, max_doc_freq=None
        ).collect()
    )
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(df, threshold=0.5).collect()
    )
    assert got == exact
    assert len(got) > 0  # non-vacuous: the planted near-dups are found


def test_prefix_filter_finds_pairs_the_df_cap_drops(spark):
    """A pair whose every shared shingle is corpus-common is invisible to
    the capped index but found (exactly) by prefix filtering."""
    from fastselect_spark.dedup import ngram_jaccard_pairs, prefix_filter_jaccard_pairs

    common = "alpha beta gamma delta epsilon zeta"
    rows = [(i, common) for i in range(30)]  # every shingle has df=30
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, threshold=0.9, max_doc_freq=5).collect()
    assert capped == []  # the documented cap trade-off
    got = prefix_filter_jaccard_pairs(df, threshold=0.9).collect()
    assert len(got) == 30 * 29 // 2  # all identical pairs found, J = 1.0
    assert all(r.jaccard == 1.0 for r in got)


def test_hll_merge_equals_combined(spark):
    """Shard-local register tables merge (per-register max) into exactly
    the combined data's registers — the mergeability that makes the
    sketch distributable."""
    from fastselect_spark.corpus import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_merge,
        hll_register_rows,
    )
    from pyspark.sql import functions as F

    rows = [("g", f"v{i}") for i in range(900)]
    df = spark.createDataFrame(rows, "g string, v string")
    half_a = df.where(F.md5("v").substr(1, 1) < "8")
    half_b = df.subtract(half_a)

    def regs(d):
        return (
            hll_register_rows(d, ["g"], "v", 7)
            .groupBy("g", "__idx")
            .agg(F.max("__rho").alias("__m"))
        )

    merged = hll_estimate_from_registers(
        hll_merge(regs(half_a), regs(half_b), ["g"]), ["g"], 7
    ).collect()[0]
    whole = hll_distinct(df, ["g"], "v", p=7).collect()[0]
    assert merged.registers_hit == whole.registers_hit
    assert merged.hll_estimate == whole.hll_estimate  # bit-identical


def test_bloom_contamination_superset_and_exact_at_large_m(spark):
    """One-sided error: bloom hits are a superset of exact hits; with a
    huge bit space (no collisions) the counts match exactly."""
    from fastselect_spark.corpus import bloom_contamination_hits, contamination_hits

    corpus = spark.createDataFrame(
        [(i, f"unique text number {i} with words w{i}a w{i}b w{i}c") for i in range(40)]
        + [(100, "the secret benchmark passage appears here verbatim today"),
           (101, "prefix junk then the secret benchmark passage appears here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "the secret benchmark passage appears here verbatim")],
        "bid long, text string",
    )
    exact = {
        r.doc_id: r.n_hit_shingles
        for r in contamination_hits(corpus, bench).collect()
    }
    big = {
        r.doc_id: r.n_hit_shingles
        for r in bloom_contamination_hits(
            corpus, bench, m_bits=1 << 30, k_hashes=3
        ).collect()
    }
    assert big == exact  # no collisions at 2^30 bits
    assert set(exact) == {100, 101}
    small = {
        r.doc_id: r.n_hit_shingles
        for r in bloom_contamination_hits(
            corpus, bench, m_bits=64, k_hashes=2
        ).collect()
    }
    # every true hit found (never misses), counts only ever inflate
    for d, c in exact.items():
        assert small.get(d, 0) >= c


def test_rrf_fuse_python_replica(spark):
    from fastselect_spark.similarity import rrf_fuse

    a = spark.createDataFrame(
        [("q1", 1, 9.0), ("q1", 2, 5.0), ("q1", 3, 1.0), ("q2", 1, 2.0)],
        "q string, doc_id long, score double",
    )
    b = spark.createDataFrame(
        [("q1", 2, 0.9), ("q1", 4, 0.8), ("q2", 1, 0.5)],
        "q string, doc_id long, score double",
    )
    got = {
        (r.q, r.doc_id): (r.n_lists, r.rrf_score)
        for r in rrf_fuse([a, b], query_col="q", k=60).collect()
    }
    # q1: a ranks 1,2,3 -> rn 1,2,3 ; b ranks 2,4 -> rn 1,2
    assert got[("q1", 1)] == (1, 1 / 61)
    assert got[("q1", 2)] == (2, 1 / 62 + 1 / 61)
    assert got[("q1", 3)] == (1, 1 / 63)
    assert got[("q1", 4)] == (1, 1 / 62)
    assert got[("q2", 1)] == (2, 1 / 61 + 1 / 61)
    # weights scale contributions; global mode requires explicit opt-in
    w = {
        (r.q, r.doc_id): r.rrf_score
        for r in rrf_fuse([a, b], query_col="q", weights=[2.0, 1.0]).collect()
    }
    assert w[("q1", 2)] == 2 / 62 + 1 / 61
    with pytest.raises(ValueError):
        rrf_fuse([a, b])


def test_pool_embeddings_numpy_parity(spark):
    import numpy as np

    from fastselect_spark.similarity import pool_embeddings

    rng = np.random.default_rng(43)
    rows = [
        (f"g{i % 5}", [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)
    ]
    rows.append(("g0", None))  # null vector skipped
    df = spark.createDataFrame(rows, "grp string, embedding array<double>")
    got = {
        r.grp: (r.n_vecs, r.pooled)
        for r in pool_embeddings(df, ["grp"]).collect()
    }
    gmax = {
        r.grp: r.pooled
        for r in pool_embeddings(df, ["grp"], mode="max").collect()
    }
    for g in {f"g{i}" for i in range(5)}:
        vecs = np.array([v for gg, v in rows if gg == g and v is not None])
        n, pooled = got[g]
        assert n == len(vecs)
        assert np.allclose(pooled, vecs.mean(axis=0), atol=1e-12)
        assert np.allclose(gmax[g], vecs.max(axis=0), atol=0)


def test_countmin_merge_equals_combined(spark):
    from pyspark.sql import functions as F

    from fastselect_spark.corpus import countmin_merge, countmin_sketch

    rows = [(f"k{i % 30}",) for i in range(600)]
    df = spark.createDataFrame(rows, "k string")
    a = df.where(F.col("k").substr(2, 1).cast("int") % 2 == 0)
    b = df.where(F.col("k").substr(2, 1).cast("int") % 2 != 0)
    merged = {
        (r.row, r.bucket): r.cnt
        for r in countmin_merge(
            countmin_sketch(a, "k", depth=3, width=256),
            countmin_sketch(b, "k", depth=3, width=256),
        ).collect()
    }
    whole = {
        (r.row, r.bucket): r.cnt
        for r in countmin_sketch(df, "k", depth=3, width=256).collect()
    }
    assert merged == whole


def test_sketch_and_sample_edge_inputs(spark):
    """Edge hardening for the round-5 additions: short docs fall back to
    the whole-text shingle, bad sketch params raise contract errors, and
    weighted_sample with n > group size returns the whole group."""
    import pytest as _pt

    from fastselect_spark.corpus import (
        countmin_sketch,
        hll_distinct,
        weighted_sample,
    )
    from fastselect_spark.dedup import prefix_filter_jaccard_pairs

    # docs shorter than the shingle width: _shingles falls back to the
    # normalized whole text — identical shorts still pair at J=1
    df = spark.createDataFrame(
        [(1, "hi"), (2, "hi"), (3, "yo")], "doc_id long, text string"
    )
    got = prefix_filter_jaccard_pairs(df, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(1, 2, 1.0)]

    with _pt.raises(ValueError):
        hll_distinct(df, ["doc_id"], "text", p=2)
    with _pt.raises(ValueError):
        countmin_sketch(df, "text", depth=0)
    with _pt.raises(ValueError):
        weighted_sample(df, 0, "doc_id")

    small = spark.createDataFrame(
        [(1, "g", 2.0), (2, "g", 3.0)], "doc_id long, grp string, w double"
    )
    assert weighted_sample(small, 10, "w", group_cols=["grp"]).count() == 2
