"""Similarity search over embedding columns (array<float>).

  - brute-force cosine top-k: one pass, JVM-side expression math, window
    top-k — the correctness baseline.
  - LSH-bucketed top-k: random-hyperplane buckets shrink the candidate set;
    multi-probe (query matches its bucket + neighbors) trades recall for a
    bounded join fan-out.  The scale path for 10^9 vectors.
"""
from __future__ import annotations

import random
from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from information_extraction_t5_spark.functions.vectors import (
    cosine,
    hyperplane_sign_bits,
    lit_vector,
)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    r = random.Random(seed)
    return [[r.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def brute_force_topk(
    vectors: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k ids by cosine to a single query vector.

    orderBy+limit lets Spark run a distributed TakeOrdered — no full sort.
    """
    q = lit_vector(query)
    return (
        vectors.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """k nearest right-rows for every left-row (exact, O(n*m) — only for
    small right sides or pre-bucketed inputs).  ``exclude_self`` drops
    same-id pairs BEFORE ranking (matching ivf_knn_join's semantics) so
    the result is a valid exact baseline for the blocked join."""
    l = left.select(F.col(left_id).alias("qid"), F.col(vec_col).alias("qv"))
    r = right.select(F.col(right_id).alias("nid"), F.col(vec_col).alias("nv"))
    scored = l.crossJoin(r).select(
        "qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    if exclude_self:
        scored = scored.filter(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: List[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (coarse IVF quantizer).

    Centroids are a small driver-side list (seeded sample or k-means
    output) evaluated as a pure expression — the assignment is a narrow
    map, no shuffle.  Partitioning/bucketing the table by ``cell`` then
    makes probes touch only matching files.
    """
    sims = F.array(
        *[cosine(F.col(vec_col), lit_vector(c)) for c in centroids]
    )
    best = F.array_position(sims, F.array_max(sims)) - 1
    return vectors.withColumn("cell", best.cast("int"))


def ivf_topk(
    vectors: DataFrame,
    query: Sequence[float],
    centroids: List[Sequence[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only the vectors in the query's ``n_probe``
    nearest cells, then exact cosine top-k.  The filter prunes before any
    wide operation — at scale, with the table partitioned by cell, this is
    partition pruning."""
    def cos_py(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den if den else 0.0

    probe_cells = sorted(
        range(len(centroids)),
        key=lambda i: -cos_py(query, centroids[i]),
    )[:n_probe]
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    q = lit_vector(query)
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[List[float]]:
    """Lloyd's k-means as DataFrame ops (deterministic seeding).

    Assignment is a narrow expression (ivf_assign); the update step is one
    aggregation: explode (cell, dim, value) -> groupBy(cell, dim).avg.
    Only the k x dim centroid matrix ever reaches the driver — the
    vectors stay distributed.  Empty cells keep their previous centroid.
    """
    cents = seed_centroids(vectors, k, id_col, vec_col)
    dim = len(cents[0]) if cents else 0
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("dim", "v")
            )
            .groupBy("cell", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in means:
            new[r["cell"]][r["dim"]] = float(r["m"])
        cents = new
    return cents


def seed_centroids(vectors: DataFrame, n: int = 8,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> List[List[float]]:
    """Deterministic coarse centroids: the n lowest-id vectors (stand-in
    for a k-means fit; swap in ml.clustering.KMeans offline at scale)."""
    rows = (
        vectors.orderBy(F.col(id_col).asc()).limit(n).select(vec_col)
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def lsh_topk(
    vectors: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    n_probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict to the query's hyperplane bucket plus
    every bucket within ``n_probe_hamming`` sign flips (multi-probe), then
    exact cosine.  Bucket assignment is a pure expression (no UDF); the
    filter prunes before any join/shuffle.

    Multi-probe is what keeps recall flat as ``n_planes`` grows: the
    vectors most likely to be missed are the ones whose dot product with
    one plane sits near zero, and those land exactly in the Hamming-1
    neighbor buckets.  ``n_probe_hamming=0`` recovers single-bucket probing.
    """
    dim = len(query)
    planes = random_hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            qbits |= 1 << i
    bucketed = vectors.withColumn(
        "bucket", hyperplane_sign_bits(F.col(vec_col), planes)
    )
    q = lit_vector(query)
    probe = F.bit_count(
        F.col("bucket").bitwiseXOR(F.lit(qbits))
    ) <= n_probe_hamming
    return (
        bucketed.filter(probe)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_knn_join(
    left: DataFrame,
    right: DataFrame,
    centroids: List[Sequence[float]],
    k: int = 5,
    n_probe: int = 2,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Blocked kNN join — the scale path replacing knn_join_bruteforce's
    O(n*m) cross join.  Right rows are assigned to their IVF cell (narrow
    expression); every left row probes its ``n_probe`` nearest cells (a
    constant fan-out explode, also pure expressions); candidates meet in
    an equi-join on ``cell`` and the exact cosine top-k runs within cells
    only.  Approximate: a true neighbor outside the probed cells is
    missed — recall rises with n_probe, cost with n_probe/|cells|.
    Self-pairs (same id both sides) are excluded.
    """
    r = ivf_assign(right, centroids, right_id, vec_col).select(
        F.col(right_id).alias("nid"), F.col(vec_col).alias("nv"), "cell"
    )
    # per-left-row probe cells: sort (sim, idx) struct array desc, slice
    pairs = F.array(
        *[
            F.struct(
                cosine(F.col(vec_col), lit_vector(c)).alias("s"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probe = F.slice(
        F.transform(F.reverse(F.array_sort(pairs)), lambda p: p["i"]),
        1, n_probe,
    )
    l = left.select(
        F.col(left_id).alias("qid"), F.col(vec_col).alias("qv"),
        F.explode(probe).alias("cell"),
    )
    scored = (
        l.join(r, "cell")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank")
    )
