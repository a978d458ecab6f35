"""Vector math over array<float|double> columns — pure expressions.

Embedding similarity stays JVM-side: dot products via zip_with + aggregate
compile into codegen'd loops, no Python crossing.  Used by similarity search
and embedding-cosine near-dup detection.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def hyperplane_sign_bits(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """LSH bucket id from random-hyperplane signs: bit i = (vec . plane_i) > 0.

    ``planes`` is a small driver-side literal (seeded), so the bucket id is a
    deterministic pure expression — the scale path for ANN: group candidates
    by bucket, brute-force only within buckets.
    """
    bit_cols = [
        F.when(dot(vec, lit_vector(p)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bit_cols:
        out = out + b
    return out.cast("int")
