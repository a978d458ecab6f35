"""Skew handling: a pathological conversation must not break or dominate."""
import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.pipeline import PipelineConfig, run_pipeline


def test_giant_conversation_bounded_by_max_windows(spark):
    """One conversation 1000x longer than its peers: max_windows caps the
    per-conversation extraction cost (reference skew bound,
    context.py:171,339) and the pipeline still extracts its fields."""
    normal = synth.transcripts_pdf(6)
    filler = [
        {
            "conv_id": "conv_giant", "turn_idx": i, "role": "user",
            "text": f"linha de enchimento numero {i} sem conteudo relevante",
            "tool": None,
            "ts": dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
            + dt.timedelta(seconds=i),
        }
        for i in range(5000)
    ]
    # plant one extractable field at the START so a capped window sees it
    filler[0]["text"] = "Nome Completo PESSOA GIGANTE DA SILVA"
    giant = pd.DataFrame(filler)
    t = spark.createDataFrame(
        pd.concat([normal, giant], ignore_index=True),
        synth.TRANSCRIPTS_SCHEMA,
    )
    cfg = PipelineConfig()
    triples = run_pipeline(spark, t, cfg)
    by_conv = {
        r["conv_id"]: r["n"]
        for r in triples.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # normal conversations fully extracted
    assert all(by_conv.get(f"conv_{i:06d}", 0) >= 10 for i in range(6))
    # the giant yields its one planted field, not an unbounded blow-up
    giant_rows = triples.filter(F.col("conv_id") == "conv_giant").collect()
    assert any(
        r["pred"] == "form.nome_completo"
        and r["obj"] == "PESSOA GIGANTE DA SILVA"
        for r in giant_rows
    )
    # window cap held: no window_id beyond the configured max
    assert all(r["window_id"] < cfg.window.max_windows for r in giant_rows)
