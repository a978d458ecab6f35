"""as-of and range join operators vs brute-force expectations."""
import datetime as dt

from pyspark.sql import functions as F

from information_extraction_t5_spark.operators.joins import (
    asof_join,
    range_join,
)
from information_extraction_t5_spark.operators.similarity import (
    ivf_topk,
    seed_centroids,
    brute_force_topk,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("u1", _ts(5), "e1"), ("u1", _ts(20), "e2"), ("u2", _ts(9), "e3"),
         ("u3", _ts(1), "e4")],
        "user string, ts timestamp, eid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(4), "q1"), ("u1", _ts(10), "q2"), ("u2", _ts(9), "q3")],
        "user string, ts timestamp, quote string",
    )
    out = {
        r["eid"]: r["quote"]
        for r in asof_join(left, right, on="user", suffix="").collect()
    }
    assert out == {
        "e1": "q1",   # latest right at/before 5 is q1(4)
        "e2": "q2",   # q2(10) before 20
        "e3": "q3",   # equal timestamps: right sorts first -> visible
        "e4": None,   # no right row for u3
    }


def test_range_join_interval(spark):
    left = spark.createDataFrame(
        [("u1", _ts(0), "p1"), ("u1", _ts(60), "p2")],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), "r1"), ("u1", _ts(11), "r2"), ("u1", _ts(61), "r3"),
         ("u2", _ts(5), "r4")],
        "user string, ts timestamp, rid string",
    )
    out = {
        (r["pid"], r["r_rid"])
        for r in range_join(
            left, right, on="user",
            lower_seconds=0, upper_seconds=600,
        ).collect()
    }
    # p1 window [0, 10min]: r1(5) yes, r2(11) no; p2 window [60, 70]: r3(61)
    assert out == {("p1", "r1"), ("p2", "r3")}


def test_range_join_no_duplicate_pairs(spark):
    left = spark.createDataFrame(
        [("u", _ts(0), i) for i in range(5)],
        "user string, ts timestamp, pid int",
    )
    right = spark.createDataFrame(
        [("u", _ts(3), 99)], "user string, ts timestamp, rid int"
    )
    out = range_join(left, right, on="user", lower_seconds=0,
                     upper_seconds=600)
    assert out.count() == out.distinct().count() == 5


def test_ivf_topk_contains_query_cell(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.rand(60, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    cents = seed_centroids(df, n=4)
    qv = [float(x) for x in vecs[7]]
    approx = [r["vec_id"] for r in ivf_topk(df, qv, cents, k=5,
                                            n_probe=4).collect()]
    exact = [r["vec_id"] for r in brute_force_topk(df, qv, k=5).collect()]
    # probing ALL cells must equal exact search
    assert approx == exact
    # fewer probes still returns k results containing the query itself
    some = [r["vec_id"] for r in ivf_topk(df, qv, cents, k=5,
                                          n_probe=2).collect()]
    assert 7 in some
