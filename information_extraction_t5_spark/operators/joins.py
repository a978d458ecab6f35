"""Temporal join operators Spark lacks as built-ins: as-of and range joins.

Both are expressed as compositions of existing DataFrame ops (no UDFs):

  - as-of join: union-tag + window last-value-carry-forward.  One shuffle
    on (key, ts); no per-row Python; skew-bounded by the key cardinality.
  - range join: bucket blocking — join on (key, time-bucket +/- 1) then
    filter the exact interval.  Turns an O(n*m) theta join into an
    equi-join whose fan-out is bounded by the bucket width.
"""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[List[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts, per key.

    Implementation: tag and union both sides, sort within key by
    (ts, side) — right rows sort before left rows at equal ts — and carry
    the last seen right values forward with last(..., ignorenulls) over an
    unbounded-preceding window.  Exactly one shuffle.
    """
    rcols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tagged = left.select(
        F.col(on), F.col(left_ts).alias("_t"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in rcols],
    )
    r_tagged = right.select(
        F.col(on), F.col(right_ts).alias("_t"), F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{f.name}:{f.dataType.simpleString()}"
                for f in left.schema.fields
            ) + ">"
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        on, "_t", "_side", "_lrow",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col(f"{c}{suffix}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 60.0,
) -> DataFrame:
    """Pairs (l, r) with same key and r.ts in [l.ts + lower, l.ts + upper].

    Bucket blocking: both sides get time buckets of width (upper - lower);
    the equi-join on (key, bucket) with the left exploded to the 2-3
    buckets its interval can touch replaces the quadratic theta join.
    """
    width = max(upper_seconds - lower_seconds, 1e-9)

    def as_seconds(df: DataFrame, col: str):
        dtype = dict(df.dtypes)[col]
        c = F.col(col)
        if dtype.startswith("timestamp"):
            # TIMESTAMP_NTZ has no direct double cast; micros are exact
            return F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
        return c.cast("double")

    l_epoch = as_seconds(left, left_ts)
    r_epoch = as_seconds(right, right_ts)

    lo_bucket = F.floor((l_epoch + lower_seconds) / width).cast("long")
    hi_bucket = F.floor((l_epoch + upper_seconds) / width).cast("long")
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.col(on).alias("_k"),
        l_epoch.alias("_lt"),
        F.explode(F.sequence(lo_bucket, hi_bucket)).alias("_bucket"),
    )
    r = right.select(
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
        F.col(on).alias("_k"),
        r_epoch.alias("_rt"),
        F.floor(r_epoch / width).cast("long").alias("_bucket"),
    )
    joined = l.join(r, ["_k", "_bucket"]).filter(
        (F.col("_rt") >= F.col("_lt") + lower_seconds)
        & (F.col("_rt") <= F.col("_lt") + upper_seconds)
    )
    # no dedup needed: a right row lives in exactly one bucket, so each
    # qualifying (l, r) pair matches exactly once
    return joined.select("_l.*", *[
        F.col("_r")[c].alias(f"r_{c}") for c in right.columns
    ])
