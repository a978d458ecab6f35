"""Profile the KG pipeline's fixed-latency floor: per-phase walls at a tiny
corpus so parallel work ~0 and everything measured is sequential overhead.

Usage: python tools/profile_floor.py [cpus] [convs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
convs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

from information_extraction_t5_spark.session import get_spark
from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.pipeline import (
    PipelineConfig, extract_candidates, candidates_to_triples,
    canonicalize_subjects, run_pipeline,
)

spark = get_spark("floor-profile", cores=cpus)
spark.sparkContext.setLogLevel("ERROR")

cfg = PipelineConfig(model_cost_ms=30.0, fuzzy_hash="xxhash64",
                     model_tasks_per_core=4)

# warmup identical to bench
warm = synth.transcripts_df(spark, 100, partitions=2 * cpus)
run_pipeline(spark, warm, PipelineConfig(fuzzy_hash="xxhash64",
                                         model_tasks_per_core=4)).count()

transcripts = synth.transcripts_df(spark, convs, partitions=256)

t0 = time.time()
scored = extract_candidates(spark, transcripts, cfg)
triples = candidates_to_triples(scored, cfg, spark).localCheckpoint()
t1 = time.time()
print(f"phase extract+top1+triples checkpoint: {t1-t0:.2f}s "
      f"(partitions={triples.rdd.getNumPartitions()})")

final = canonicalize_subjects(triples, cfg)
t2 = time.time()
print(f"phase canonicalize build (incl name_rep ckpt + CC): {t2-t1:.2f}s")

n = final.count()
t3 = time.time()
print(f"phase final count: {t3-t2:.2f}s  ({n} triples)")
print(f"TOTAL: {t3-t0:.2f}s")
