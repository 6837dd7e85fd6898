"""Distributed connected components — the resolution step of corpus-scale
dedup: near-dup PAIRS (minhash/simhash/embedding LSH) become KEEP decisions
only once transitively-connected docs share one canonical cluster id.

Min-label propagation over the undirected edge set: every node repeatedly
takes the min label among itself and its neighbours; at fixpoint the label
is the component's minimum node id (deterministic, run-order independent).
Each iteration is two bounded-key equi-joins + one partial-agg groupBy, and
the iteration count is the component hop-diameter — small for dedup
clusters (near-dup graphs are dense blobs, not paths).  For adversarial
long-chain graphs the known upgrade is star-contraction (Kiveris et al.,
"Connected Components in MapReduce", SoCC'14) which squares the label
reach per round; the fixpoint contract (and this API) stays the same.

Same convergence discipline as plans/network.build_jumpers_sharded: loudly
raise if the diameter exceeds max_iter instead of silently splitting a
component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id of the connected component."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = e.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        la = labels.select(F.col("node").alias("a"), F.col("label"))
        prop = (
            e.join(la, "a")
            .select(F.col("b").alias("node"), "label")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # cut lineage per iteration
        )
        changed = (
            prop.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = prop
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"({changed} labels still moving): component hop-diameter exceeds "
        "max_iter — raise it, or switch to star-contraction for chain graphs"
    )


def dedup_resolution(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """Near-dup pairs → (doc_id, component_id, keep): one canonical
    (minimum-id) keeper per transitive duplicate cluster — the standard
    corpus-dedup keep rule."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )
