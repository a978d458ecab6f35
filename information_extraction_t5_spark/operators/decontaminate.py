"""Benchmark decontamination: flag / drop training documents that share
word n-grams with an evaluation set.

The standard LLM-corpus hygiene step (GPT-3 appendix C, PaLM §C,
Dolma/FineWeb pipelines): any training document containing an n-gram
(n = 13 words in most published setups) that also occurs in a held-out
benchmark is considered contaminated and removed, so eval scores measure
generalization rather than memorization.

Scale shape (the part that must survive 100 TB):

- The BENCHMARK side is small by construction (eval sets are MBs, not
  TBs).  It collapses to a distinct-hash set once —
  ``benchmark_ngrams`` — and is broadcast to every executor.
- The CORPUS side is never shuffled.  ``contamination_stats`` explodes
  each document into its n-gram hashes IN THE SAME STAGE as the parquet
  scan (project + explode fuse into one WholeStageCodegen span) and
  probes the broadcast hash set.  Only the MATCHES — a tiny fraction of
  rows — reach the one ``groupBy(doc_id)`` shuffle.
- ``decontaminate`` anti-joins the corpus against the matched ids; the
  id set is again small, so Spark broadcasts it (AQE converts the
  anti-join to BroadcastHashJoin at runtime).

Grams are md5-hashed by default so the broadcast set carries fixed-width
32-char keys instead of arbitrary-length strings AND so the DuckDB
oracle can replay the exact same join keys (the repo-wide
``fuzzy_hash='md5'`` replayability convention — see
``pipeline.PipelineConfig``).  ``hash_fn='xxhash64'`` halves the key
width again for ultra-scale runs where oracle replay is not needed.

Reference scope note: the reference pipeline
(/root/reference/information_extraction_t5, data/preprocess.py) has no
decontamination stage — this module is part of the net-new
training-data curation layer mandated alongside SURVEY.md §2.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from information_extraction_t5_spark.operators.quality import word_ngrams


def _gram_hash(col, hash_fn: str):
    if hash_fn == "md5":
        return F.md5(col)
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5|xxhash64)")


def benchmark_ngrams(bench: DataFrame, text_col: str = "text",
                     n: int = 13, hash_fn: str = "md5") -> DataFrame:
    """Distinct n-gram hashes of the benchmark set: one column
    ``gram_hash``.  Small enough to broadcast (distinct over the eval
    set's grams); compute once and reuse across corpus shards."""
    return (
        bench.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .select(_gram_hash(F.col("gram"), hash_fn).alias("gram_hash"))
        .distinct()
    )


def contamination_stats(docs: DataFrame, bench_grams: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 13, hash_fn: str = "md5") -> DataFrame:
    """Per-document contamination: ``(id_col, n_hit_grams,
    contaminated)`` for EVERY document (0 / false for clean ones).

    Corpus scan -> explode grams -> broadcast-hash probe; only hits are
    shuffled (groupBy on the id), then left-joined back onto the id set
    so clean documents appear with a zero count.
    """
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).select(
        id_col, _gram_hash(F.col("gram"), hash_fn).alias("gram_hash")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram_hash", "inner")
        .groupBy(id_col)
        .agg(F.countDistinct("gram_hash").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint")
            .alias("n_hit_grams"),
        )
        .withColumn("contaminated", F.col("n_hit_grams") > 0)
    )


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, hash_fn: str = "md5") -> DataFrame:
    """Corpus minus contaminated documents (all original columns).

    The anti-join's right side is the matched-id set — tiny relative to
    the corpus — so AQE picks a broadcast anti-join and the corpus is
    never shuffled end-to-end.
    """
    grams = benchmark_ngrams(bench, text_col=text_col, n=n,
                             hash_fn=hash_fn)
    flagged = contamination_stats(
        docs, grams, id_col=id_col, text_col=text_col, n=n,
        hash_fn=hash_fn,
    ).filter("contaminated").select(id_col)
    return docs.join(flagged, id_col, "left_anti")
