"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference pipeline (neuralmind-ai/information-extraction-t5,
read-only at /root/reference): triple extraction from multi-turn transcripts,
entity linking, canonicalization, and graph materialization — built on the
DataFrame API + Arrow-batched pandas UDFs, designed for 100 TB / multi-executor
scale (partitioning, broadcast joins, AQE skew handling, checkpoint/resume).

Layout:
  core/        pure-Python semantic kernels (shared by UDFs and tests)
  functions/   column-expression builders (JVM-side, codegen-friendly)
  operators/   DataFrame-level operators (windows, extraction, linking, ...)
  data/        deterministic synthetic transcript generator
  pipeline.py  end-to-end extract -> link -> canonicalize -> materialize
"""

__version__ = "0.1.0"
