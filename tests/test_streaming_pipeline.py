"""Streaming KG pipeline: closed sessions -> extraction -> appended triples,
with checkpoint recovery across restarts."""
import datetime as dt
import os

import pandas as pd
from pyspark.sql import functions as F

from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.streaming.ingest import (
    stream_pipeline,
    stream_transcripts_from_files,
)


def test_stream_pipeline_emits_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    n = 4
    pdf = synth.transcripts_pdf(n)
    spark.createDataFrame(pdf, synth.TRANSCRIPTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        stream = stream_transcripts_from_files(
            spark, src, synth.TRANSCRIPTS_SCHEMA
        )
        q = stream_pipeline(spark, stream, out, ckpt, gap="10 minutes")
        q.awaitTermination(180)

    run_once()

    # a far-future sentinel turn pushes the watermark so the last real
    # sessions finalize on the next run (append semantics: only closed
    # sessions are extracted)
    sentinel = pd.DataFrame(
        [{
            "conv_id": "zz_sentinel", "turn_idx": 0, "role": "user",
            "text": "fim", "tool": None,
            "ts": dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
        }]
    )
    spark.createDataFrame(sentinel, synth.TRANSCRIPTS_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = spark.read.parquet(out)
    convs = {r["conv_id"] for r in got.select("conv_id").distinct().collect()}
    assert {f"conv_{i:06d}" for i in range(n)} <= convs

    # triples from the streaming path match the batch pipeline's
    from information_extraction_t5_spark.pipeline import run_pipeline

    batch = run_pipeline(
        spark, spark.createDataFrame(pdf, synth.TRANSCRIPTS_SCHEMA)
    )
    batch_set = {
        (r["conv_id"], r["pred"], r["obj"])
        for r in batch.select("conv_id", "pred", "obj").collect()
    }
    stream_set = {
        (r["conv_id"], r["pred"], r["obj"])
        for r in got.select("conv_id", "pred", "obj").collect()
        if r["conv_id"] != "zz_sentinel"
    }
    assert batch_set == stream_set
