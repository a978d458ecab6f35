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


def test_ivf_cell_join_aqe_skew_split(spark):
    """A deliberately dense IVF cell (≈80% of right rows) must be split by
    AQE's skew-join handling, not processed as one straggler task
    (VERDICT r2 item 4).  Thresholds are lowered so the local-mode data
    crosses them; on a real cluster the defaults (256MB) play the same
    role.  Asserts the executed adaptive plan marked the join skew=true."""
    import numpy as np

    from information_extraction_t5_spark.operators.similarity import (
        ivf_knn_join,
    )

    dim = 8
    rng = np.random.RandomState(7)
    centroids = [
        [1.0 if j == i else 0.0 for j in range(dim)] for i in range(4)
    ]

    def near(cell, n, start):
        base = np.array(centroids[cell])
        vecs = base + rng.normal(0, 0.05, size=(n, dim))
        return [
            (start + i, [float(x) for x in vecs[i]]) for i in range(n)
        ]

    # 80% of the right side lands in cell 0
    right_rows = (near(0, 8000, 0) + near(1, 700, 10000)
                  + near(2, 700, 20000) + near(3, 600, 30000))
    left_rows = near(0, 150, 50000) + near(1, 50, 60000)
    right = spark.createDataFrame(
        right_rows, "vec_id bigint, embedding array<double>"
    )
    left = spark.createDataFrame(
        left_rows, "vec_id bigint, embedding array<double>"
    )

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16k",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        out = ivf_knn_join(left, right, centroids, k=3, n_probe=1)
        rows = out.collect()  # materialize -> AQE finalizes the plan
        assert len(rows) == 3 * len(left_rows)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
