"""Exact/F1 metrics + rollup aggregations (DataFrame-level).

The reference computes per-row exact/token-F1 then averages globally and per
qid group (reference: utils/metrics.py:46-131).  Here:

  - exact match is a pure expression;
  - token F1 needs multiset intersection -> explode/count form (exact) or an
    Arrow UDF (operators.postprocess.f1_udf);
  - the rollup is GROUPING SETS ((), (group)) — one shuffle, map-side
    partial aggregation.
"""
from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from information_extraction_t5_spark.core.textnorm import token_f1
from information_extraction_t5_spark.functions.text import answer_tokens, normalize_answer


def exact_match(gold: Column, pred: Column) -> Column:
    """(normalize(gold) == normalize(pred))::int (reference: metrics.py:46-47)."""
    return (normalize_answer(gold) == normalize_answer(pred)).cast("int")


@F.pandas_udf(DoubleType())
def f1_udf(gold: pd.Series, pred: pd.Series) -> pd.Series:
    """Arrow-batched multiset token F1 — exact reference parity
    (metrics.py:50-63) including duplicate-token counting."""
    return pd.Series([token_f1(g or "", p or "") for g, p in zip(gold, pred)])


def f1_approx(gold: Column, pred: Column) -> Column:
    """Expression-only F1 ignoring duplicate tokens (array_intersect is
    set-semantic).  Exact when tokens within an answer are distinct — used
    by the SQL-checkable oracle query; the pipeline uses f1_udf."""
    gt = answer_tokens(gold)
    pt = answer_tokens(pred)
    both_empty = (F.size(gt) == 0) & (F.size(pt) == 0)
    either_empty = (F.size(gt) == 0) | (F.size(pt) == 0)
    common = F.size(F.array_intersect(gt, pt)).cast("double")
    precision = common / F.size(pt)
    recall = common / F.size(gt)
    f1 = F.when(common == 0, F.lit(0.0)).otherwise(
        2 * precision * recall / (precision + recall)
    )
    return (
        F.when(both_empty, F.lit(1.0))
        .when(either_empty, F.lit(0.0))
        .otherwise(f1)
    )


def eval_rollup(
    scored: DataFrame,
    group_col: str = "group_key",
    exact_col: str = "exact",
    f1_col: str = "f1",
) -> DataFrame:
    """Global + per-group eval dict as rows (reference: metrics.py:66-131).

    Output: (group_key, exact, f1, total) where group_key NULL/'' is the
    global row; scores are 100-scaled means.  One aggregation with grouping
    sets — no second pass for the global row.
    """
    return scored.rollup(group_col).agg(
        F.round(F.avg(exact_col) * 100.0, 6).alias("exact"),
        F.round(F.avg(f1_col) * 100.0, 6).alias("f1"),
        F.count(F.lit(1)).alias("total"),
    )


def score(
    df: DataFrame,
    gold_col: str = "label",
    pred_col: str = "prediction",
    exact_f1: bool = True,
) -> DataFrame:
    """Attach per-row exact/f1 columns."""
    out = df.withColumn("exact", exact_match(F.col(gold_col), F.col(pred_col)))
    if exact_f1:
        out = out.withColumn("f1", f1_udf(F.col(gold_col), F.col(pred_col)))
    else:
        out = out.withColumn("f1", f1_approx(F.col(gold_col), F.col(pred_col)))
    return out
