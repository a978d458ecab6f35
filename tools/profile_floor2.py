"""Finer-grained floor profile of phase 1 (extract job) at tiny corpus."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
convs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

from information_extraction_t5_spark.session import get_spark
from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.pipeline import (
    PipelineConfig, extract_candidates, candidates_to_triples, run_pipeline,
)
from information_extraction_t5_spark.operators.windows import assemble_documents
from information_extraction_t5_spark.operators.postprocess import top1_window, best_to_triples
from information_extraction_t5_spark.operators.linking import alias_df, link_aliases

spark = get_spark("floor-profile2", cores=cpus)
spark.sparkContext.setLogLevel("ERROR")

cfg = PipelineConfig(model_cost_ms=30.0, fuzzy_hash="xxhash64",
                     model_tasks_per_core=4)

warm = synth.transcripts_df(spark, 100, partitions=2 * cpus)
run_pipeline(spark, warm, PipelineConfig(fuzzy_hash="xxhash64",
                                         model_tasks_per_core=4)).count()

transcripts = synth.transcripts_df(spark, convs, partitions=256)

def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label}: {time.time()-t0:.2f}s")
    return r

t("synth count", lambda: transcripts.count())
t("assemble count", lambda: assemble_documents(transcripts).count())
scored = extract_candidates(spark, transcripts, cfg)
t("extract count", lambda: scored.count())
slim = scored.select("conv_id", "qa_id", "window_id", "prediction", "prob")
best = top1_window(slim, use_fewer_na=True)
t("top1 count", lambda: best.count())
triples = best_to_triples(best)
linked = link_aliases(triples, alias_df(spark), value_col="obj",
                      out_col="obj", predicates=cfg.link_predicates,
                      pred_col="pred")
t("linked localCheckpoint", lambda: linked.localCheckpoint())
t("full phase1 again (fresh lineage)",
  lambda: candidates_to_triples(extract_candidates(spark, transcripts, cfg),
                                cfg, spark).localCheckpoint())
