"""Canonicalization: connected components over mention-similarity edges.

Union-find expressed as iterative DataFrame joins (alternating large-star /
small-star style min-label propagation) — converges in O(log n) rounds on
real graphs, deterministic canonical id = min member id.  No GraphFrames
dependency; lineage is truncated every round with localCheckpoint so plans
don't snowball.  (SURVEY.md §4: custom logic, not a Catalyst rule.)
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is undirected input (string ids).  Algorithm: keep a label per
    node (init = own id); each round every node adopts the min label in its
    closed neighborhood; stop when no label changes.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        # the edge set is re-joined every round: cut its lineage once so
        # upstream stages (extraction!) are never recomputed per iteration
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

    for _ in range(max_iter):
        # neighbor labels: node <- min(label[b]) over edges (a=node, b)
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component"))
                 < F.col("component")).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break

    return labels


def canonical_entities(
    mentions: DataFrame,
    mention_col: str = "conv_id",
    key_col: str = "mention_key",
) -> DataFrame:
    """(mention, canonical_id): mentions sharing any key are one entity.

    Builds the bipartite mention-key edges, collapses keys to their min
    mention (one shuffle), then runs components on the mention-mention
    projection.  Keys are blocking keys (exact cpf, normalized name,
    LSH bucket, ...) produced upstream.
    """
    pairs = mentions.select(
        F.col(mention_col).alias("mention"), F.col(key_col).alias("key")
    ).distinct()
    # project bipartite graph onto mentions: every key links its mentions
    # to the key's min mention (star, not clique: |edges| = |pairs|)
    key_rep = pairs.groupBy("key").agg(F.min("mention").alias("rep"))
    edges = (
        pairs.join(key_rep, "key")
        .select(F.col("mention").alias("src"), F.col("rep").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    comps = connected_components(edges)
    all_mentions = pairs.select("mention").distinct()
    return (
        all_mentions.join(
            comps.withColumnRenamed("node", "mention"), "mention", "left"
        )
        .select(
            "mention",
            F.coalesce(F.col("component"), F.col("mention")).alias(
                "canonical_id"
            ),
        )
    )
