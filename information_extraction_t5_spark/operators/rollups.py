"""Hypertable-style time rollups + bucketed co-located joins.

  - time_rollup: one pass over an event table producing aggregates at
    several time granularities via GROUPING SETS on derived buckets —
    one shuffle total instead of one per granularity.
  - bucketed writes: co-locate big-big joins by pre-bucketing both sides
    on the join key (bucketBy + saveAsTable); the join then needs no
    exchange at read time.
"""
from __future__ import annotations

import logging

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRANULARITIES = ["minute", "hour", "day", "week", "month", "year"]


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    granularities: Optional[List[str]] = None,
    value_col: Optional[str] = "value",
    keys: Optional[List[str]] = None,
) -> DataFrame:
    """Aggregates at multiple granularities in ONE aggregation.

    Output: (grain, bucket_start, <keys...>, n, max_value, min_value).
    Implemented by exploding each row into its (grain, bucket) pairs then
    a single groupBy — map-side combine still applies because the fan-out
    is a constant factor (len(granularities)).
    """
    grains = granularities or ["hour", "day"]
    keys = keys or []
    # date_trunc buckets (Spark rejects multiple window() expressions in
    # one projection; truncation is the same epoch-aligned bucketing for
    # calendar grains)
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).alias("grain"),
                F.date_trunc(g, F.col(ts_col)).alias("bucket_start"),
            )
            for g in grains
        ]
    )
    exploded = events.select(
        *keys,
        F.explode(pairs).alias("gb"),
        *( [F.col(value_col)] if value_col else [] ),
    ).select(
        *keys,
        F.col("gb.grain").alias("grain"),
        F.col("gb.bucket_start").alias("bucket_start"),
        *( [F.col(value_col)] if value_col else [] ),
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    if value_col:
        aggs += [
            F.round(F.max(value_col), 2).alias("max_value"),
            F.round(F.min(value_col), 2).alias("min_value"),
        ]
    return exploded.groupBy("grain", "bucket_start", *keys).agg(*aggs)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: Optional[str] = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on the join key.

    Two tables bucketed the same way join WITHOUT a shuffle — the physical
    plan shows no Exchange on either side (verified in tests).  This is
    the local-metastore equivalent of Iceberg's bucket partition
    transform.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped-from-metastore table can leave its managed location behind
    # (fresh in-memory catalogs don't know about old runs); clear it.
    # Only missing-path is silent: any other I/O failure is logged because
    # a stale directory makes the saveAsTable below collide, and the log
    # line is the breadcrumb that explains it.  Non-I/O errors propagate.
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = urlparse(warehouse).path or warehouse
    try:
        shutil.rmtree(f"{loc}/{table.lower()}")
    except FileNotFoundError:
        pass
    except OSError as exc:
        logging.getLogger(__name__).warning(
            "stale warehouse cleanup failed for table %s at %s/%s: %s",
            table, loc, table.lower(), exc,
        )
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables (shuffle-free when bucket specs match)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
