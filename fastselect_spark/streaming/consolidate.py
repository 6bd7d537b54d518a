"""Periodic consolidation of a streamed near-dup PAIR feed into
checkpointed duplicate clusters — the maintenance job that closes the
streaming dedup loop (round-4 verdict item 6).

:func:`fastselect_spark.streaming.minhash.streaming_minhash_candidates`
emits bare candidate pairs continuously; CLUSTERING them (connected
components + survivor choice) is inherently a batch/iterative computation.
The :class:`ClusterConsolidator` runs as a periodic job over the pair
stream's parquet sink directory:

1. list the sink's pair files; fold only the ones NOT yet recorded in the
   consolidator's manifest;
2. union the new pairs with the PRIOR cluster assignment re-expressed as
   star edges ``(doc_id → comp)`` — connectivity-preserving and tiny (one
   edge per already-clustered node, not the historical pair log);
3. rerun :func:`fastselect_spark.dedup.components.connected_components`
   (min-label with automatic large-star/small-star fallback) over that
   union;
4. write the new assignment snapshot, then commit the manifest ATOMICALLY
   (temp file + rename — the same resume discipline as
   ``runtime/checkpoint.py``).

Resume semantics: a crash after the snapshot write but before the manifest
rename leaves the manifest pointing at the previous version, so the next
run refolds the same files — idempotent, because components over a union
of edge sets do not care about duplicate edges. Incremental folding in ANY
file batching is provably equal to batch clustering of the union of all
emitted pairs: a prior component's label is its minimum member id, which
is itself a node of the star edges, so min-reachable labels compose across
folds.

Scale shape: the per-fold graph is (new pairs) + (one star edge per known
node) — NOT the unbounded pair history; state on disk is one (doc_id,
comp) row per clustered document. At 100 TB ingest the fold cost tracks
the rate of NEW near-dup pairs, and the CC rounds are bounded by the
large-star fallback regardless of chain length.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastselect_spark.dedup.components import connected_components


def _list_pair_files(pairs_dir: str) -> list[str]:
    out: list[str] = []
    for root, dirs, files in os.walk(pairs_dir):
        dirs[:] = [d for d in dirs if not d.startswith("_")]  # _spark_metadata
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                out.append(os.path.join(root, f))
    return sorted(out)


class ClusterConsolidator:
    """Checkpointed duplicate-cluster state over a streamed pair feed.

    ``state_dir`` holds numbered assignment snapshots plus a manifest::

        <state_dir>/assignments_v00003/   (doc_id, comp) parquet
        <state_dir>/_manifest.json        {"version": 3, "folded": [...]}
    """

    def __init__(self, state_dir: str, id_a: str = "id_a", id_b: str = "id_b"):
        self.state_dir = state_dir
        self.id_a, self.id_b = id_a, id_b
        os.makedirs(state_dir, exist_ok=True)

    # ------------------------------------------------------------ manifest
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "_manifest.json")

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"version": 0, "folded": []}

    def _commit_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.state_dir, f"assignments_v{version:05d}")

    # ------------------------------------------------------------- reads
    def assignments(self, spark: SparkSession) -> DataFrame | None:
        """Current committed (doc_id, comp) assignment, or None before the
        first consolidation."""
        manifest = self._load_manifest()
        if manifest["version"] == 0:
            return None
        return spark.read.parquet(self._snapshot_path(manifest["version"]))

    # ----------------------------------------------------------- the job
    def consolidate(self, spark: SparkSession, pairs_dir: str) -> DataFrame:
        """Fold pair files not yet in the manifest into the cluster state;
        returns the committed (doc_id, comp) assignment DataFrame."""
        manifest = self._load_manifest()
        folded = set(manifest["folded"])
        new_files = [f for f in _list_pair_files(pairs_dir) if f not in folded]
        prior = self.assignments(spark)
        if not new_files:
            if prior is None:
                raise ValueError(
                    f"no pair files under {pairs_dir} and no prior state"
                )
            return prior
        edges = (
            spark.read.parquet(*new_files)
            .select(F.col(self.id_a).alias("id_a"), F.col(self.id_b).alias("id_b"))
        )
        if prior is not None:
            edges = edges.unionByName(
                prior.select(
                    F.col("doc_id").alias("id_a"), F.col("comp").alias("id_b")
                )
            )
        labels = connected_components(edges, "id_a", "id_b")
        version = manifest["version"] + 1
        labels.write.mode("overwrite").parquet(self._snapshot_path(version))
        # commit AFTER the snapshot is fully written: a crash in between
        # leaves the old manifest, and the rerun refolds the same files
        self._commit_manifest(
            {"version": version, "folded": sorted(folded | set(new_files))}
        )
        return spark.read.parquet(self._snapshot_path(version))
