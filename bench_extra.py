"""Extra benchmarks for the optimization round (guide §1.4 noop-sink
isolation). NOT part of the driver contract — bench.py stays frozen; this
file exists so per-stage numbers and job counts can be measured and cited
in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py dedup      # per-stage breakdown of _q_dedup_pipeline
  python bench_extra.py headline   # per-stage breakdown of the bench pipeline
  python bench_extra.py ops        # corpus-op timings w/ Spark job counts
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark(name: str):
    from fastselect_spark.runtime.session import get_spark

    return get_spark(app_name=name, master=f"local[{CPUS}]")


def _warm(spark):
    spark.range(1024).repartition(int(CPUS)).mapInPandas(
        lambda it: it, schema="id long"
    ).count()


def _n_jobs(spark) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return (max(ids) + 1) if ids else 0


class JobMeter:
    """Wall time + number of Spark jobs per labeled step."""

    def __init__(self, spark):
        self.spark = spark
        self.rows: list[tuple[str, float, int]] = []

    def step(self, label: str, fn):
        self.spark.sparkContext.setJobDescription(label)
        before = _n_jobs(self.spark)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        after = _n_jobs(self.spark)
        self.spark.sparkContext.setJobDescription(None)
        self.rows.append((label, dt, after - before))
        print(f"  {label:42s} {dt:7.3f}s  jobs={after - before}")
        return out

    def report(self):
        total = sum(r[1] for r in self.rows)
        print(f"  {'TOTAL':42s} {total:7.3f}s  jobs={sum(r[2] for r in self.rows)}")
        return {l: {"sec": round(t, 3), "jobs": j} for l, t, j in self.rows}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def dedup_breakdown():
    from pyspark.sql import functions as F

    from fastselect_spark.dedup import (
        connected_components,
        dedup_exact,
        minhash_near_duplicates,
    )

    spark = _spark("bx-dedup")
    _warm(spark)
    m = JobMeter(spark)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    survivors = m.step(
        "dedup_exact+persist+count",
        lambda: (lambda s: (s.count(), s))(dedup_exact(docs).persist())[1],
    )
    pairs = m.step(
        "minhash_near_duplicates",
        lambda: minhash_near_duplicates(
            survivors, threshold=0.5, num_hashes=64, bands=16, hash_family="md5"
        ),
    )
    m.step("pairs.count", pairs.count)
    comp = m.step("connected_components", lambda: connected_components(pairs))
    m.step("comp materialize", lambda: _noop(comp))
    dropped = comp.where(F.col("doc_id") != F.col("comp")).select("doc_id")
    kept = survivors.join(dropped, "doc_id", "left_anti").select("doc_id", "source")
    m.step("anti-join + localCheckpoint", kept.localCheckpoint)
    rep = m.report()
    spark.stop()
    return rep


def minhash_breakdown():
    """Inside minhash: signature vs band join vs verify."""
    from pyspark.sql import functions as F

    from fastselect_spark.dedup import dedup_exact
    from fastselect_spark.dedup.minhash import (
        _band_table,
        add_minhash_signature,
        ensure_parallelism,
        verify_candidate_pairs,
    )

    spark = _spark("bx-minhash")
    _warm(spark)
    m = JobMeter(spark)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    survivors = dedup_exact(docs).persist()
    survivors.count()
    sig = add_minhash_signature(ensure_parallelism(survivors), "text", 3, 64, "md5")
    m.step("signature only (noop on minhash col)", lambda: _noop(sig.select("doc_id", "minhash")))
    banded = _band_table(sig, "doc_id", 16, 4, "md5").persist()
    m.step("band table persist+count", banded.count)
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
    cand = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .persist()
    )
    m.step("bucket self-join -> cand persist+count", cand.count)
    ver = verify_candidate_pairs(survivors, cand, "text", "doc_id", 3, 0.5)
    m.step("verify (jaccard)", lambda: _noop(ver))
    m.report()
    spark.stop()


def headline_breakdown():
    import bench

    spark = _spark("bx-headline")
    _warm(spark)
    # one warm pass like bench's warm_in_jvm
    bench._pipeline(spark, SF_DIR, sample_mod=40)
    spark.sparkContext._jvm.System.gc()
    for i in range(3):
        n, t = bench._pipeline(spark, SF_DIR)
        print(f"  run{i}: {json.dumps({k: round(v, 3) for k, v in t.items()})}")
    spark.stop()


def kmeans_breakdown():
    from fastselect_spark.similarity import kmeans_clusters, train_ivf_centroids

    spark = _spark("bx-kmeans")
    _warm(spark)
    m = JobMeter(spark)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = m.step("train_ivf_centroids n=16", lambda: train_ivf_centroids(emb, n_cells=16))
    m.step(
        "kmeans assign",
        lambda: kmeans_clusters(emb, n_clusters=16, centroids=cents).count(),
    )
    m.report()
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    {
        "dedup": dedup_breakdown,
        "minhash": minhash_breakdown,
        "headline": headline_breakdown,
        "kmeans": kmeans_breakdown,
    }[mode]()
