"""cosine_scores_numpy must be a bit-exact twin of the expression cosine.

The numpy path (r7) replaces per-pair interpreted HOF-lambda evaluation for
the probe-set similarity queries; these tests pin value equality (unrounded,
string-cast so every ulp and zero-sign counts) including the ragged/null
fallback semantics.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from information_extraction_t5_spark.functions.vectors import cosine
from information_extraction_t5_spark.operators.similarity import (
    brute_force_topk,
    cosine_scores_numpy,
)


def _expr_scores(spark, df, probes):
    out = None
    for qid, vec in probes:
        q = F.array(*[F.lit(None).cast("double") if v is None
                      else F.lit(float(v)) for v in vec])
        s = df.select(
            F.lit(qid).cast("bigint").alias("qid"),
            F.col("vec_id").cast("bigint").alias("nid"),
            cosine(q, F.col("embedding")).alias("cos"),
        )
        out = s if out is None else out.unionByName(s)
    return out


def _assert_bitwise_equal(a, b):
    am = {(r["qid"], r["nid"]): str(r["cos"]) for r in a.collect()}
    bm = {(r["qid"], r["nid"]): str(r["cos"]) for r in b.collect()}
    assert am == bm


def test_numpy_scores_match_expression(spark):
    r = random.Random(7)
    rows = [(i, [r.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    probes = [(i, vec) for i, vec in rows[:3]]
    _assert_bitwise_equal(
        cosine_scores_numpy(df, probes), _expr_scores(spark, df, probes)
    )


def test_numpy_scores_ragged_and_null_rows(spark):
    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, [4.0, 5.0, 6.0]),
        (2, [1.0, 2.0]),          # ragged: shorter than the probe
        (3, None),                 # null vector
        (4, [1.0, None, 3.0]),     # null element
        # (zero vectors are not comparable: under ANSI mode the expression
        # path raises DIVIDE_BY_ZERO while numpy yields NaN — no such
        # vectors exist in any driver table; noted in the helper docstring)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    probes = [(0, [1.0, 2.0, 3.0])]
    _assert_bitwise_equal(
        cosine_scores_numpy(df, probes), _expr_scores(spark, df, probes)
    )


def test_brute_force_topk_numpy_twin(spark):
    r = random.Random(11)
    rows = [(i, [r.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    qvec = rows[0][1]
    a = [tuple(x) for x in brute_force_topk(df, qvec, k=7).collect()]
    b = [tuple(x) for x in
         brute_force_topk(df, qvec, k=7, via="numpy").collect()]
    assert a == b


@pytest.mark.parametrize("neg_zero_products", [False, True])
def test_seq_fold_matches_jvm_fold_zero_sign(spark, neg_zero_products):
    """The fold seed 0.0 + p0 decides the sign of an all-(-0.0) dot
    product (an unseeded accumulate would keep -0.0); the numpy path must
    reproduce the JVM's +0.0.  Norms stay nonzero so ANSI division is
    defined on both paths."""
    if neg_zero_products:
        # every elementwise product is -0.0 -> dot must be +0.0 (seeded)
        row = [-0.0, -0.0, -5.0]
    else:
        row = [0.0, 0.0, -5.0]
    df = spark.createDataFrame(
        [(7, row)], "vec_id long, embedding array<double>"
    )
    probes = [(0, [1.0, 1.0, 0.0])]
    _assert_bitwise_equal(
        cosine_scores_numpy(df, probes), _expr_scores(spark, df, probes)
    )
