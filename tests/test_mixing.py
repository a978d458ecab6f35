"""Domain-mix rebalancing (operators/mixing.py): exact-rational rate
construction, determinism, up/down-sampling semantics, and the
scale-critical plan shape.  Oracle parity of the driver gate
``source_rebalance`` is covered by tools/check_oracle.py."""
import io
import sys

import pytest
from pyspark.sql import functions as F

from information_extraction_t5_spark.operators.mixing import (
    rebalance_sources,
    source_rates,
)


def _docs(spark, per_source=200, sources=("a", "b", "c")):
    rows = [
        (s_i * per_source + i, s)
        for s_i, s in enumerate(sources)
        for i in range(per_source)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_rates_exact_rational(spark):
    docs = _docs(spark, per_source=100)
    r = {row["source"]: row for row in
         source_rates(docs, {"a": 6, "b": 3, "c": 1}).collect()}
    # total defaults to 300 (all three sources targeted), wsum = 10
    assert (r["a"]["num"], r["a"]["den"]) == (1800, 1000)  # rate 1.8
    assert (r["b"]["num"], r["b"]["den"]) == (900, 1000)   # rate 0.9
    assert (r["c"]["num"], r["c"]["den"]) == (300, 1000)   # rate 0.3


def test_untargeted_source_dropped_and_total_excludes_it(spark):
    docs = _docs(spark, per_source=100)
    rates = {row["source"]: row for row in
             source_rates(docs, {"a": 1}).collect()}
    assert rates["b"]["num"] == 0 and rates["c"]["num"] == 0
    assert rates["a"]["num"] == rates["a"]["den"] == 100  # rate exactly 1
    out = rebalance_sources(docs, {"a": 1})
    got = out.groupBy("source").count().collect()
    # rate exactly 1 -> every 'a' doc kept exactly once, others gone
    assert {(r["source"], r["count"]) for r in got} == {("a", 100)}
    assert out.filter("copy != 0").count() == 0


def test_mixture_concentrates_near_target(spark):
    docs = _docs(spark, per_source=200)
    out = rebalance_sources(docs, {"a": 6, "b": 3, "c": 1}, total=600)
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    # expectations 360/180/60; Bernoulli tails are tiny at these sizes
    assert abs(counts["a"] - 360) < 40
    assert abs(counts["b"] - 180) < 35
    assert abs(counts.get("c", 0) - 60) < 25
    # upsampled source emits copy ordinals; each (id, copy) is unique
    assert out.filter("source = 'a' and copy = 1").count() > 100
    assert out.count() == out.select("doc_id", "copy").distinct().count()


def test_deterministic_under_repartition(spark):
    docs = _docs(spark, per_source=150)
    a = rebalance_sources(docs, {"a": 2, "b": 1}, seed=11).collect()
    b = rebalance_sources(
        docs.repartition(13), {"a": 2, "b": 1}, seed=11
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bad_targets_raise(spark):
    docs = _docs(spark, per_source=10)
    with pytest.raises(ValueError):
        source_rates(docs, {})
    with pytest.raises(ValueError):
        source_rates(docs, {"a": -1, "b": 2})
    with pytest.raises(ValueError):
        source_rates(docs, {"a": 0})


def test_missing_targeted_source_raises(spark):
    # ADVICE r5: a misspelled/absent source in targets used to vanish
    # through the left join and silently skew the whole mixture
    docs = _docs(spark, per_source=10)
    with pytest.raises(ValueError, match="no observed documents.*zz"):
        source_rates(docs, {"a": 1, "zz": 1})
    with pytest.raises(ValueError, match="zz"):
        rebalance_sources(docs, {"a": 1, "zz": 1}, total=10)
    # zero-weight entries are allowed to be absent (they ask for nothing)
    assert source_rates(docs, {"a": 1, "zz": 0}).count() == 3


def test_duplicate_ids_across_sources_draw_independently(spark):
    # ADVICE r5: the keep draw is salted with source as well as id — the
    # same id in two sources must flip independent coins.  At rate 1/2
    # each, a correlated draw keeps every id in BOTH sources or NEITHER
    # (zero ids kept exactly once); independent draws keep ~half once.
    rows = [(i, s) for s in ("a", "b") for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = rebalance_sources(docs, {"a": 1, "b": 1}, total=400)
    kept = out.groupBy("doc_id").count().collect()
    once = sum(1 for r in kept if r["count"] == 1)
    both = sum(1 for r in kept if r["count"] == 2)
    assert once > 100          # correlated draws would give exactly 0
    assert 40 < both < 180     # ~100 expected


def test_plan_broadcasts_rates_no_corpus_shuffle(spark):
    docs = _docs(spark, per_source=50)
    out = rebalance_sources(docs, {"a": 3, "b": 1}, total=100)
    buf, old = io.StringIO(), sys.stdout
    sys.stdout = buf
    out.explain("formatted")
    sys.stdout = old
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only Exchange may be the |sources|-row count agg, never a
    # corpus-wide hash partitioning on the source column over docs
    assert "SortMergeJoin" not in plan


def test_null_source_rows_pass_through_with_rate_zero(spark):
    """ADVICE r6: a NULL source must not crash source_rates (None key in
    sorted()); it passes through with rate 0 like the pre-r6 left-join."""
    from information_extraction_t5_spark.operators.mixing import (
        rebalance_sources,
    )

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")],
        "doc_id long, source string",
    )
    out = rebalance_sources(docs, {"a": 1, "b": 1})
    null_rows = out.filter(out.source.isNull()).collect()
    # rate 0 -> no emitted copies for the NULL-source doc
    assert null_rows == []
    assert out.filter(out.source.isNotNull()).count() > 0
