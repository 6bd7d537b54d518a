"""Connected components over the near-duplicate pair graph — the
duplicate-CLUSTERING step of a dedup pipeline: pairs (from exact/Jaccard/
MinHash/SimHash/embedding candidates) are grouped into components and each
component gets a canonical representative (min id), so "keep one copy per
duplicate cluster" is a single join away.

Algorithm: min-label propagation — every node starts labeled with itself;
each round a node adopts the minimum label among itself and its neighbors
(one join + one min-aggregation per round, all Catalyst ops). Converges in
O(component diameter) rounds; near-dup clusters are small-diameter by
construction (a pair list, not a web graph), so this is typically 3-5
rounds. Convergence is detected by counting CHANGED labels in the same
pass that computes them (a boolean-sum agg per round) — id-type-agnostic
(works for string doc ids) and ANSI-safe (no raw id summation, which
overflows a long for large id domains). If ``max_iter`` rounds pass
without a fixpoint, a warning is raised and callers should switch to the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same join primitives, O(log n) rounds; not
needed for dedup-shaped inputs.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, component) for every node in ``pairs``; component = min id
    reachable through the pair graph. Warns if max_iter is exhausted before
    the fixpoint (partially-propagated labels would silently split long
    chains otherwise)."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    persisted = labels  # the cached frame backing `labels` this round
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")
                ).cast("long").alias("__changed"),
            )
            .persist()
        )
        n_changed = new.agg(F.sum("__changed")).collect()[0][0]
        persisted.unpersist()
        persisted = new
        labels = new.select("node", "comp")
        if not n_changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        warnings.warn(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; labels may be partially propagated "
            "(split clusters). Increase max_iter or use a "
            "large-star/small-star implementation for long-chain graphs.",
            UserWarning,
        )
    # eager: materialize labels, release the final round's cache (persist
    # hygiene — the loop's last persisted frame otherwise outlives the call)
    result = labels.select(F.col("node").alias("doc_id"), "comp").localCheckpoint()
    persisted.unpersist()
    return result


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(component, keep_id, n_members) per duplicate cluster — keep_id is
    the canonical (minimum-id) member, matching exact dedup's survivor
    rule."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.groupBy("comp").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
