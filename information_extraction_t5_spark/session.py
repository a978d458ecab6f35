"""SparkSession factory tuned for the KG-construction workload.

Local-mode defaults mirror what a 1000-executor cluster deployment would set
per executor: AQE on (runtime re-plan + skew-join splitting), Arrow on (all
Python crossings are batched), sane shuffle-partition and broadcast
thresholds.  On a real cluster the same builder is fed by spark-submit confs;
nothing here is local-only except the master default.
"""
from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ie-t5-spark",
    cores: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: parallelism for local mode (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to max(2*cores, 32) — at cluster scale this
      is instead sized so post-shuffle partitions land near 128-256MB; AQE
      coalesces the excess.
    """
    env_cores = os.environ.get("SPARK_GRAFT_CPUS")
    n = cores if cores is not None else (int(env_cores) if env_cores else None)
    master = f"local[{n}]" if n else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * (n or 16), 32)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing, skew-join splitting, join-strategy switch
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep Spark's default parallelism-first coalescing: byte-based
        # coalescing (parallelismFirst=false) is blind to downstream
        # per-row cost and SERIALIZES model-inference UDF stages (observed:
        # extraction collapsed to one task, 10x wall-time regression);
        # the tiny-task overhead it saves is ~2s per bench run
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / toPandas crossing
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
