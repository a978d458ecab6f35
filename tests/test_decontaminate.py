"""Benchmark decontamination (operators/decontaminate.py): planted
contamination on hand-checkable inputs, edge cases, and the
scale-critical plan shape (benchmark set broadcast, corpus never
shuffled pre-join).  Oracle parity of the driver gate
``decontamination_flags`` is covered by tools/check_oracle.py."""
import io
import sys

import pytest

from information_extraction_t5_spark.operators.decontaminate import (
    benchmark_ngrams,
    contamination_stats,
    decontaminate,
)


def _plan(df) -> str:
    buf, old = io.StringIO(), sys.stdout
    sys.stdout = buf
    df.explain("formatted")
    sys.stdout = old
    return buf.getvalue()


DOCS = [
    # 0 shares the 5-gram "a b c d e" with the benchmark
    (0, "x a b c d e y"),
    # 1 is clean (no 5-gram overlap; "a b c d" alone is only 4)
    (1, "a b c d q r s t"),
    # 2 contains TWO distinct benchmark 5-grams
    (2, "a b c d e f"),
    # 3 repeats ONE benchmark gram twice -> still 1 distinct hit
    (3, "a b c d e z a b c d e"),
    # 4 too short for any 5-gram
    (4, "a b c"),
]
BENCH = [(100, "p q a b c d e f w")]


@pytest.fixture(scope="module")
def flags(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    grams = benchmark_ngrams(bench, n=5)
    out = contamination_stats(docs, grams, n=5)
    return {r["doc_id"]: r for r in out.collect()}


def test_planted_hits(flags):
    assert flags[0]["n_hit_grams"] == 1 and flags[0]["contaminated"]
    assert flags[1]["n_hit_grams"] == 0 and not flags[1]["contaminated"]
    # doc 2: "a b c d e" and "b c d e f" both occur in the benchmark
    assert flags[2]["n_hit_grams"] == 2
    # repeated occurrences of one gram count once (countDistinct)
    assert flags[3]["n_hit_grams"] == 1


def test_short_and_clean_docs_present_with_zero(flags):
    assert set(flags) == {0, 1, 2, 3, 4}
    assert flags[4]["n_hit_grams"] == 0 and not flags[4]["contaminated"]


def test_decontaminate_survivors(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    out = decontaminate(docs, bench, n=5)
    assert {r["doc_id"] for r in out.collect()} == {1, 4}
    assert out.columns == ["doc_id", "text"]


def test_n_longer_than_benchmark_flags_nothing(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    out = decontaminate(docs, bench, n=50)
    assert out.count() == len(DOCS)


def test_xxhash_path_matches_md5(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    a = contamination_stats(docs, benchmark_ngrams(bench, n=5), n=5)
    b = contamination_stats(
        docs, benchmark_ngrams(bench, n=5, hash_fn="xxhash64"),
        n=5, hash_fn="xxhash64",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_broadcasts_benchmark_no_cartesian(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    plan = _plan(
        contamination_stats(docs, benchmark_ngrams(bench, n=5), n=5)
    )
    # the gram probe must be a broadcast build (benchmark side), never a
    # cartesian or nested-loop over the corpus
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
