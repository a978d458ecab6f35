"""Structured Streaming ingestion smoke: session windows + stateful dedup."""
import pytest
from pyspark.sql import functions as F

from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.streaming.ingest import (
    sessionized_conversations,
    stream_transcripts_from_files,
)


def test_sessionized_stream(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    out_table = "stream_out_test"

    pdf = synth.transcripts_pdf(4)
    # replay one turn to exercise dropDuplicatesWithinWatermark
    dup = pdf.iloc[[0]]
    spark.createDataFrame(
        __import__("pandas").concat([pdf, dup]), synth.TRANSCRIPTS_SCHEMA
    ).write.mode("overwrite").parquet(src)

    stream = stream_transcripts_from_files(
        spark, src, synth.TRANSCRIPTS_SCHEMA
    )
    assert stream.isStreaming
    sessions = sessionized_conversations(stream, gap="30 minutes")

    query = (
        sessions.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.sql(f"select * from {out_table}").collect()
    assert len(got) == 4
    by_conv = {r["conv_id"]: r for r in got}
    for cid, row in by_conv.items():
        assert row["text"] == "\n".join(synth.document_lines(cid))
        assert row["n_turns"] == len(synth.conversation_turns(cid))
