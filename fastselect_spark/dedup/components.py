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
rounds. Convergence is detected by the monotone label-sum invariant:
labels only ever decrease, so an unchanged sum means a fixpoint — one tiny
agg per round instead of an old-vs-new join. For adversarial
long-chain graphs, switch to the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") — same
join primitives, O(log n) rounds; not needed for dedup-shaped inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, component) for every node in ``pairs``; component = min id
    reachable through the pair graph."""
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
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
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
            )
            .persist()
        )
        cur_sum = new.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()
        labels = new
        if cur_sum == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), "comp")


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
