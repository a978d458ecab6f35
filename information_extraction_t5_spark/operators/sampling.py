"""Deterministic reservoir / weighted sampling for corpus curation.

Training-data pipelines subsample constantly (per-source quotas, quality-
weighted draws, eval holdouts).  At 100 TB a sampler must be (a) one pass,
(b) deterministic under any partitioning, (c) shuffle-light.  This module
implements Efraimidis-Spirakis weighted sampling without replacement
(key = -ln(u)/w, keep the k smallest keys; "Weighted random sampling with
a reservoir", IPL 2006) with the uniform draw derived from md5(id:seed) —
no RNG state, so results are identical on any cluster layout AND
replayable by the DuckDB oracle.

  - global top-k by key compiles to TakeOrdered (map-side heaps per
    partition, k rows to the driver-side merge — never a full sort);
  - per-group sampling is one shuffle (window row_number over the key).

The related-but-different operator `balance.balance` does per-group
sampling WITH replacement (the reference's negative resampling); this one
is the without-replacement corpus sampler.
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _uniform(id_col: Column, seed: int) -> Column:
    """Deterministic u in (0, 1]: md5 of (id, seed), 32-bit prefix."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    return (h + 1) / F.lit(4294967296.0)


def sample_key(id_col: Column, weight: Optional[Column] = None,
               seed: int = 42) -> Column:
    """Efraimidis-Spirakis sort key: -ln(u)/w; the k SMALLEST keys are a
    weighted sample without replacement.  weight=None -> uniform."""
    key = -F.log(_uniform(id_col, seed))
    if weight is not None:
        # weights must be > 0: a zero weight yields key=+inf (never
        # sampled — the sensible limit); a NEGATIVE weight would always
        # win and is a caller bug.  A NULL weight would yield a NULL key,
        # and ascending sort puts nulls FIRST — malformed rows would
        # silently dominate every sample — so nulls collapse to +inf
        # (never sampled) alongside zero weights.
        key = key / weight.cast("double")
        key = F.coalesce(key, F.lit(float("inf")))
    return key


def weighted_sample(df: DataFrame, k: int, id_col: str,
                    weight_col: Optional[str] = None,
                    seed: int = 42) -> DataFrame:
    """Global weighted sample of k rows without replacement.

    orderBy(key).limit(k) lets Spark run TakeOrdered: each partition keeps
    a k-row heap; only k rows per partition reach the driver merge.
    """
    w = F.col(weight_col) if weight_col else None
    keyed = df.withColumn("_skey", sample_key(F.col(id_col), w, seed))
    return (
        keyed.orderBy(F.col("_skey").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_skey")
    )


def grouped_sample(df: DataFrame, k: int, id_col: str,
                   group_cols: List[str],
                   weight_col: Optional[str] = None,
                   seed: int = 42) -> DataFrame:
    """Per-group weighted sample of up to k rows without replacement —
    the per-source-quota operator.  One shuffle (the window)."""
    w = F.col(weight_col) if weight_col else None
    keyed = df.withColumn("_skey", sample_key(F.col(id_col), w, seed))
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("_skey").asc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("_srn", F.row_number().over(win))
        .filter(F.col("_srn") <= k)
        .drop("_skey", "_srn")
    )
