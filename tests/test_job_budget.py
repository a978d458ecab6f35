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
