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


# ---------------------------------------------------------------------------
# numpy twin of functions.vectors.cosine — bit-exact, batched (r7)
# ---------------------------------------------------------------------------
#
# The expression cosine() evaluates its zip_with/aggregate lambdas
# INTERPRETED (no whole-stage codegen for higher-order functions), which
# costs ~200ns per element — dominant when a query scores |rows| x |probes|
# pairs.  Unrolling the fold into a flat codegen'd expression is WORSE (the
# 192-term tree disables whole-stage codegen and interpreted tree-walking is
# slower than the HOF loop; measured r7).  The fast path that preserves the
# result bit-for-bit is numpy with the fold's exact semantics:
#
#   - per-element products a[i]*b[i] are single IEEE ops (identical),
#   - the JVM fold is ((0.0 + p0) + p1) + ... ; np.add.accumulate is
#     defined as the same left-to-right accumulation, and seeding
#     p0 + 0.0 reproduces the fold's initial 0.0 + p0 (relevant only to
#     the sign of a -0.0 first product),
#   - norm/sqrt/division are the same correctly-rounded IEEE ops.
#
# Equivalence is pinned by tests and the oracle value-hash gates.


def _seq_fold_sum(prods):
    """Left-to-right IEEE sum along the last axis, identical to the JVM
    fold aggregate(arr, 0.0, acc + v)."""
    import numpy as np

    if prods.shape[-1] == 0:
        return np.zeros(prods.shape[:-1], dtype=np.float64)
    prods = prods.astype(np.float64, copy=True)
    prods[..., 0] = prods[..., 0] + 0.0
    return np.add.accumulate(prods, axis=-1)[..., -1]


def _arrow_matrix(col, dim: int):
    """(n, dim) float64 matrix from an Arrow list column; None when the
    column is ragged/nulled (caller falls back to the per-row path)."""
    import numpy as np

    if col.null_count:
        return None
    try:
        offsets = col.offsets.to_numpy()
    except AttributeError:
        return None
    if len(offsets) < 2:
        return None
    widths = offsets[1:] - offsets[:-1]
    if not (widths == dim).all():
        return None
    if col.values.null_count:  # null ELEMENTS inside lists
        return None
    flat = col.values.to_numpy(zero_copy_only=False)
    flat = flat[offsets[0]:offsets[-1]]
    return flat.astype(np.float64, copy=False).reshape(-1, dim)


def _fold_cos_py(a, b):
    """Per-row fallback replicating cosine()'s null/ragged semantics:
    zip_with pads the shorter array with null, a null product nulls the
    whole sum."""
    import numpy as np

    if a is None or b is None:
        return None

    def fold_dot(x, y):
        m = max(len(x), len(y))
        acc = np.float64(0.0)
        for i in range(m):
            xi = x[i] if i < len(x) else None
            yi = y[i] if i < len(y) else None
            if xi is None or yi is None:
                return None
            acc = acc + np.float64(xi) * np.float64(yi)
        return acc

    def fold_norm(x):
        acc = np.float64(0.0)
        for xi in x:
            if xi is None:
                return None
            v = np.float64(xi)
            acc = acc + v * v
        return acc

    import numpy as _np
    d, na2, nb2 = fold_dot(a, b), fold_norm(a), fold_norm(b)
    if d is None or na2 is None or nb2 is None:
        return None
    with _np.errstate(divide="ignore", invalid="ignore"):
        return float(d / (_np.sqrt(na2) * _np.sqrt(nb2)))


def cosine_scores_numpy(
    vectors: DataFrame,
    queries,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, nid, cos) for every (query, row) pair, cos unrounded double —
    the batched numpy twin of selecting cosine(query, row) per pair.

    ``queries`` is a small driver-side list of (qid, vector) — the probe
    set of a top-k / knn query (10s of rows).  Only the vector table
    crosses Arrow once; the |queries| x |rows| scoring runs vectorized in
    numpy with fold-exact summation (see module comment).  Self-pairs are
    emitted; filter downstream if unwanted.

    Divergence from the expression twin: a zero-norm vector yields NaN
    here but raises DIVIDE_BY_ZERO under ANSI mode (Spark 4 default) on
    the expression path.  No driver table contains zero vectors.
    """
    import numpy as np
    import pyarrow as pa

    qitems = [(int(qid), [None if v is None else float(v) for v in vec])
              for qid, vec in queries]
    dim = len(qitems[0][1]) if qitems else 0

    def gen(batches):
        qn = {}
        for qid, qv in qitems:
            if any(v is None for v in qv):
                qn[qid] = None
            else:
                arr = np.asarray(qv, dtype=np.float64)
                qn[qid] = np.sqrt(_seq_fold_sum(arr * arr))
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            col = batch.column(1)
            mat = _arrow_matrix(col, dim)
            out_qid, out_nid, out_cos = [], [], []
            if mat is not None:
                nb = np.sqrt(_seq_fold_sum(mat * mat))
                with np.errstate(divide="ignore", invalid="ignore"):
                    for qid, qv in qitems:
                        if qn[qid] is None:
                            cos = np.full(n, np.nan)
                            mask = np.ones(n, dtype=bool)
                        else:
                            qarr = np.asarray(qv, dtype=np.float64)
                            dots = _seq_fold_sum(mat * qarr)
                            cos = dots / (qn[qid] * nb)
                            mask = np.zeros(n, dtype=bool)
                        out_qid.append(np.full(n, qid, dtype=np.int64))
                        out_nid.append(ids)
                        c = pa.array(cos, type=pa.float64(),
                                     mask=mask if mask.any() else None)
                        out_cos.append(c)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_qid), type=pa.int64()),
                        pa.array(np.concatenate(out_nid), type=pa.int64()),
                        pa.concat_arrays([c.combine_chunks()
                                          if hasattr(c, "combine_chunks")
                                          else c for c in out_cos]),
                    ],
                    names=["qid", "nid", "cos"],
                )
            else:
                rows = col.to_pylist()
                for qid, qv in qitems:
                    for rid, rvec in zip(ids, rows):
                        out_qid.append(qid)
                        out_nid.append(int(rid))
                        out_cos.append(_fold_cos_py(qv, rvec))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_qid, type=pa.int64()),
                        pa.array(out_nid, type=pa.int64()),
                        pa.array(out_cos, type=pa.float64()),
                    ],
                    names=["qid", "nid", "cos"],
                )

    slim = vectors.select(
        F.col(id_col).cast("bigint").alias("nid"), F.col(vec_col)
    )
    return slim.mapInArrow(gen, schema="qid bigint, nid bigint, cos double")


def brute_force_topk(
    vectors: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    via: str = "expr",
) -> DataFrame:
    """Top-k ids by cosine to a single query vector.

    orderBy+limit lets Spark run a distributed TakeOrdered — no full sort.
    ``via='numpy'`` scores batches through cosine_scores_numpy (bit-exact,
    ~4x at bench scale); ``'expr'`` keeps the pure-expression plan.
    """
    if via == "numpy":
        scores = cosine_scores_numpy(vectors, [(0, list(query))],
                                     id_col, vec_col)
        return (
            scores.select(
                F.col("nid").alias(id_col),
                F.round(F.col("cos"), 6).alias("cos"),
            )
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k)
        )
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
