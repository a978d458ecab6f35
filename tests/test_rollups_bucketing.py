"""Multi-grain time rollups + shuffle-free bucketed joins."""
import io
import pytest
import sys

from pyspark.sql import functions as F

from information_extraction_t5_spark.operators.rollups import (
    bucketed_join,
    time_rollup,
    write_bucketed,
)


def test_time_rollup_matches_per_grain(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rolled = time_rollup(ev, granularities=["hour", "day"])
    hourly = {
        (r["bucket_start"], r["n"])
        for r in rolled.filter(F.col("grain") == "hour").collect()
    }
    expected = {
        (r["w"], r["n"])
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    assert hourly == expected
    days = rolled.filter(F.col("grain") == "day")
    assert days.agg(F.sum("n")).head()[0] == ev.count()


def _plan(df) -> str:
    buf, old = io.StringIO(), sys.stdout
    sys.stdout = buf
    df.explain("formatted")
    sys.stdout = old
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders", "custkey", n_buckets=8,
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer", "custkey", n_buckets=8,
    )
    joined = bucketed_join(spark, "b_orders", "b_customer", "custkey")
    # correctness: equals the plain join
    plain = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    )
    assert joined.count() == plain.count()
    # physical plan: no shuffle on either side (bucket specs align);
    # broadcast is disabled to force the co-located sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bucketed_join(spark, "b_orders", "b_customer", "custkey"))
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_write_bucketed_cleanup_error_handling(spark, monkeypatch):
    """Missing stale dir is silent, other OSErrors are logged-but-survived,
    and non-I/O errors PROPAGATE (the old bare except swallowed them)."""
    import shutil

    from information_extraction_t5_spark.operators import rollups

    df = spark.createDataFrame([(1, "a")], "k int, v string")

    def boom(path):
        raise RuntimeError("not an I/O problem")

    monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="not an I/O problem"):
        rollups.write_bucketed(df, "bkt_err_tbl", "k")

    def denied(path):
        raise PermissionError("denied")  # an OSError: logged, not fatal

    monkeypatch.setattr(shutil, "rmtree", denied)
    rollups.write_bucketed(df, "bkt_err_tbl", "k")
    assert spark.table("bkt_err_tbl").count() == 1
    spark.sql("DROP TABLE IF EXISTS bkt_err_tbl")
