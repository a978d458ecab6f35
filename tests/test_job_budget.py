"""Blocking-job budget for the end-to-end pipeline.

Spark jobs (eager localCheckpoints, gate probes, collects, convergence
checks, plus AQE's per-exchange stage jobs) are the pipeline's fixed
latency floor — each costs driver round-trips regardless of data size,
and on this host wall-clock is too noisy to catch a few extra ones.  Job
COUNT is noise-free: pin it so a change that quietly adds blocking
actions or bloats the adaptive plan (a per-round count, an accidental
eager materialization, an extra exchange) fails loudly.
Phase profile at the r4 baseline: triples checkpoint 5, fuzzy edge build
3, canonical_entities 15, final join+count 13.

Measured r4 baseline at 60 convs, local[8]: 36 jobs with fuzzy linking,
20 without.  Budgets leave small headroom; if you trip one, either your
change added serial latency (fix it) or it legitimately restructured the
pipeline (re-measure and move the pin with justification).
"""
from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)

BUDGET_FUZZY = 40
BUDGET_EXACT = 24


def _jobs_for(spark, cfg: PipelineConfig, group: str) -> int:
    sc = spark.sparkContext
    t = synth.transcripts_df(spark, 60)
    t.count()  # materialize input outside the measured group
    sc.setJobGroup(group, "job budget")
    assert run_pipeline(spark, t, cfg).count() > 0
    sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_pipeline_job_budget_fuzzy(spark):
    n = _jobs_for(spark, PipelineConfig(fuzzy_link=True), "budget_fuzzy")
    assert n <= BUDGET_FUZZY, (
        f"pipeline now issues {n} blocking jobs (budget {BUDGET_FUZZY}); "
        "a serial action crept in"
    )


def test_pipeline_job_budget_exact_only(spark):
    n = _jobs_for(spark, PipelineConfig(fuzzy_link=False), "budget_exact")
    assert n <= BUDGET_EXACT, (
        f"pipeline now issues {n} blocking jobs (budget {BUDGET_EXACT}); "
        "a serial action crept in"
    )


# ---------------------------------------------------------------------------
# scale-path operator budgets (VERDICT r4 item 5).  Each operator has a
# fixed expected job profile; the pin catches accidental eager actions
# (a stray .count(), an unbounded CC probe, a per-centroid collect) that
# the wall-clock can't see on this host.  Budgets = measured r5 baseline
# + small headroom (measured at local[8], shuffle_partitions=8).
# ---------------------------------------------------------------------------

# measured 17: LSH candidate join lineage + star-contraction CC rounds
# (convergence probes are limit(1).count() mini-jobs) + the survivor
# anti-join count.  Dup clusters of 4 guarantee the CC loop iterates.
BUDGET_NEAR_DEDUP = 22
# measured 11: seed collect + 3 Lloyd's iterations (one distributed
# groupBy-avg collect each — k x dim floats only) + the blocked join
# count.  Grows linearly with iters, NOT with data or k.
BUDGET_IVF = 14
# measured 54: parquet scan + full canonicalization (exact keys + fuzzy
# LSH edge build + CC) + two catalog snapshot writes + node/edge
# materialization + the readback count.
BUDGET_COMPACT = 62


def _grouped_jobs(spark, group: str, fn) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(group, "job budget")
    fn()
    sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_near_dedup_cluster_job_budget(spark):
    from pyspark.sql import functions as F

    from information_extraction_t5_spark.operators.dedup import (
        near_dedup_survivors,
    )

    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("some document text number "),
            (F.col("id") % 30).cast("string"),
            F.lit(" with shared words and a tail "),
            (F.col("id") % 30).cast("string"),
        ).alias("text"),
    ).localCheckpoint()  # materialized outside the measured group
    n = _grouped_jobs(
        spark, "budget_near_dedup",
        lambda: near_dedup_survivors(docs, "doc_id", "text").count(),
    )
    assert n <= BUDGET_NEAR_DEDUP, (
        f"near_dedup_survivors now issues {n} blocking jobs "
        f"(budget {BUDGET_NEAR_DEDUP})"
    )


def test_ivf_knn_join_job_budget(spark):
    from pyspark.sql import functions as F

    from information_extraction_t5_spark.operators.similarity import (
        ivf_knn_join,
        kmeans_fit,
    )

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.round(F.sin((F.col("id") + 1) * (i + 1)), 4) + F.lit(1.1)
                for i in range(8)
            ]
        ).alias("embedding"),
    ).localCheckpoint()

    def run():
        cents = kmeans_fit(emb, k=4, iters=3,
                           id_col="vec_id", vec_col="embedding")
        ivf_knn_join(emb, emb, cents, k=3, n_probe=2,
                     left_id="vec_id", right_id="vec_id").count()

    n = _grouped_jobs(spark, "budget_ivf", run)
    assert n <= BUDGET_IVF, (
        f"kmeans_fit + ivf_knn_join now issue {n} blocking jobs "
        f"(budget {BUDGET_IVF})"
    )


def test_compact_streamed_triples_job_budget(spark, tmp_path):
    import os

    from information_extraction_t5_spark.catalog import Catalog
    from information_extraction_t5_spark.streaming.ingest import (
        compact_streamed_triples,
    )

    t = synth.transcripts_df(spark, 40)
    triples = run_pipeline(spark, t).select(
        "conv_id", "pred", "obj", "obj_raw", "subj"
    )
    tp = os.path.join(str(tmp_path), "triples")
    triples.write.mode("overwrite").parquet(tp)  # outside the group
    cat = Catalog(spark, os.path.join(str(tmp_path), "cat"))
    n = _grouped_jobs(
        spark, "budget_compact",
        lambda: compact_streamed_triples(spark, tp, cat).count(),
    )
    assert n <= BUDGET_COMPACT, (
        f"compact_streamed_triples now issues {n} blocking jobs "
        f"(budget {BUDGET_COMPACT})"
    )


# measured 6: the benchmark-gram distinct + broadcast build, the hit
# aggregation, the anti-join count (plus AQE stage jobs).  Constant in
# corpus size — a creeping per-gram or per-doc action would blow it.
BUDGET_DECONTAMINATE = 8
# measured 9 with total=None (the targeted-total collect lineage) and 5
# with an explicit total; the gap IS the documented cost of defaulting
# total, so both shapes are pinned.
BUDGET_REBALANCE_DEFAULT = 12
BUDGET_REBALANCE_EXPLICIT = 7


def _curation_docs(spark):
    from pyspark.sql import functions as F

    return spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 5).cast("string"),
            F.lit(" some shared text body with many words "),
            (F.col("id") % 7).cast("string"),
            F.lit(" tail a b c d e f g h"),
        ).alias("text"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
        .alias("source"),
    ).localCheckpoint()


def test_decontaminate_job_budget(spark):
    from information_extraction_t5_spark.operators.decontaminate import (
        decontaminate,
    )

    docs = _curation_docs(spark)
    bench = docs.filter("doc_id % 37 = 0").localCheckpoint()
    n = _grouped_jobs(
        spark, "budget_decontaminate",
        lambda: decontaminate(docs, bench, n=5).count(),
    )
    assert n <= BUDGET_DECONTAMINATE, (
        f"decontaminate now issues {n} blocking jobs "
        f"(budget {BUDGET_DECONTAMINATE})"
    )


def test_rebalance_job_budget(spark):
    from information_extraction_t5_spark.operators.mixing import (
        rebalance_sources,
    )

    docs = _curation_docs(spark)
    n = _grouped_jobs(
        spark, "budget_rebalance_default",
        lambda: rebalance_sources(docs, {"s0": 2, "s1": 1}).count(),
    )
    assert n <= BUDGET_REBALANCE_DEFAULT, (
        f"rebalance_sources(total=None) now issues {n} blocking jobs "
        f"(budget {BUDGET_REBALANCE_DEFAULT})"
    )
    n = _grouped_jobs(
        spark, "budget_rebalance_explicit",
        lambda: rebalance_sources(docs, {"s0": 2, "s1": 1},
                                  total=200).count(),
    )
    assert n <= BUDGET_REBALANCE_EXPLICIT, (
        f"rebalance_sources(total=...) now issues {n} blocking jobs "
        f"(budget {BUDGET_REBALANCE_EXPLICIT})"
    )
