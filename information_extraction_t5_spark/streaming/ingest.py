"""Streaming transcript ingestion (optional path; SURVEY.md §2.9).

The batch pipeline is authoritative (north rule); this module shows the
streaming-append shape: readStream over the transcripts source, watermark on
``ts``, session windows per conversation (a conversation is "closed" after
``gap`` of inactivity), stateful dedup of replayed turns within the
watermark.  The closed sessions feed the same downstream operators as batch.

No reference analogue exists — net-new design, kept dependency-light and
covered by a smoke test using the file source.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_conversations(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Close conversations after ``gap`` inactivity; emit assembled text.

    Turn order inside the session is restored by sorting the collected
    (turn_idx, text) structs — same stable-order invariant as batch
    assembly, resilient to out-of-order arrival within the watermark.
    """
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    return (
        deduped.groupBy(
            F.session_window("ts", gap).alias("session"),
            F.col("conv_id"),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "text"))
            ).alias("turns")
        )
        .select(
            "conv_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            F.array_join(
                F.transform("turns", lambda t: t["text"]), "\n"
            ).alias("text"),
            F.size("turns").alias("n_turns"),
        )
    )


def stream_transcripts_from_files(spark, path: str, schema: str) -> DataFrame:
    """File-source streaming reader (stand-in for Iceberg/Kafka streams)."""
    return spark.readStream.schema(schema).parquet(path)
