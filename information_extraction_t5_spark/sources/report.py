"""Per-document-class sheet artifact (the reference's Excel sink).

The reference pivots the prediction table per document class — rows are
document ids, column groups are typenames, values are (label, prediction,
exact, f1, prob) — and writes one xlsx sheet per class (reference:
models/qa_model.py:388-436).  Spark-side the pivot is a distributed
groupBy().pivot(); only the final write chooses a format:

  - default ('xlsx')  -> one workbook, one sheet per class (reference
    parity artifact): openpyxl when importable, else the stdlib OOXML
    writer in sources/xlsx.py (r6 — a REAL .xlsx with no dependencies,
    closing the prior CSV-degradation gap);
  - fmt='csv'         -> one CSV per class under ``out_dir`` (same
    frames, plain-text artifact).

The pivot itself never collects: at 100 TB you'd point the same frames at
``.write.parquet`` instead; the xlsx/CSV export is a human-report sink and
is inherently driver-sized (per-class rollups).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from information_extraction_t5_spark.functions.metrics import (
    exact_match,
    f1_approx,
)

VALUE_AGGS = ("label", "prediction", "exact", "f1", "prob")


def class_of(example_col: str = "example_id"):
    """Document class = the project prefix of the dotted qa_id."""
    return F.split(F.col(example_col), r"\.").getItem(0)


def pivoted_class_frame(
    preds: DataFrame,
    document_class: Optional[str] = None,
    doc_col: str = "document_id",
    example_col: str = "example_id",
    label_col: str = "label",
    pred_col: str = "prediction",
    prob_col: str = "prob",
    typenames: Optional[List[str]] = None,
) -> DataFrame:
    """One pivoted sheet frame: row per document, a (label, prediction,
    exact, f1, prob) column group per typename.  Distributed: one shuffle
    (the groupBy/pivot); pass ``typenames`` to skip the pivot-value
    discovery job at scale."""
    scored = (
        preds.withColumn(
            "exact",
            exact_match(F.col(label_col), F.col(pred_col)).cast("int"),
        )
        .withColumn(
            "f1", F.round(f1_approx(F.col(label_col), F.col(pred_col)), 6)
        )
        # typename id = everything after the project prefix, i.e. after
        # the FIRST dot (consistent with class_of; a last-segment rule
        # would collide 'form.endereco.estado' with any other '*.estado'
        # — ADVICE r2).  Keeps '~subfield' / '*' markers and inner dots.
        .withColumn(
            "_tn",
            F.expr(
                f"substring({example_col}, instr({example_col}, '.') + 1)"
            ),
        )
    )
    if document_class is not None:
        scored = scored.filter(class_of(example_col) == document_class)
    # deterministic pre-reduce to one row per (document, typename): the
    # reference's pandas df.pivot RAISES on duplicates, and F.first() over
    # duplicate rows (multiple windows, choose_question='all' replication)
    # is order-dependent.  Keep the highest-prob row, ties broken on
    # (prediction, label) text order.
    from pyspark.sql import Window as _W

    dedup_w = _W.partitionBy(doc_col, "_tn").orderBy(
        F.col(prob_col).desc_nulls_last(),
        F.col(pred_col).asc_nulls_last(),
        F.col(label_col).asc_nulls_last(),
    )
    scored = (
        scored.withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    grouped = scored.groupBy(F.col(doc_col).alias("document_id"))
    pivot = grouped.pivot("_tn", typenames) if typenames \
        else grouped.pivot("_tn")
    return pivot.agg(
        F.first(label_col).alias("label"),
        F.first(pred_col).alias("prediction"),
        F.first("exact").alias("exact"),
        F.first("f1").alias("f1"),
        F.first(prob_col).alias("prob"),
    ).orderBy("document_id")


def write_frame_csv(df: DataFrame, path: str) -> None:
    """Write one DataFrame as a single named CSV file (header included).

    coalesce(1) is deliberate: a sheet artifact is one file by contract;
    the upstream pivot already ran distributed."""
    tmp = path + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = next(
        f for f in sorted(os.listdir(tmp))
        if f.startswith("part-") and f.endswith(".csv")
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    os.replace(os.path.join(tmp, part), path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def write_class_report(
    preds: DataFrame,
    out_dir: str,
    doc_col: str = "document_id",
    example_col: str = "example_id",
    label_col: str = "label",
    pred_col: str = "prediction",
    prob_col: str = "prob",
    fmt: Optional[str] = None,
) -> Dict[str, str]:
    """Materialize the per-class sheet artifact; returns {class: file path}.

    ``fmt``: 'xlsx' (one workbook, one sheet per class — the reference
    artifact, models/qa_model.py:388-436), 'csv' (one file per class), or
    None = xlsx.  The xlsx path needs NO third-party writer (r6): openpyxl
    is used when importable, else the stdlib OOXML writer
    (sources/xlsx.py) produces an equally readable workbook.
    """
    if fmt not in (None, "xlsx", "csv"):
        raise ValueError(f"fmt must be 'xlsx', 'csv' or None, got {fmt!r}")
    classes = [
        r["c"]
        for r in preds.select(class_of(example_col).alias("c"))
        .distinct().orderBy("c").collect()
    ]
    frames = {
        c: pivoted_class_frame(
            preds, c, doc_col, example_col, label_col, pred_col, prob_col
        )
        for c in classes
    }
    os.makedirs(out_dir, exist_ok=True)

    out: Dict[str, str] = {}
    if fmt == "csv":
        for c, frame in frames.items():
            path = os.path.join(out_dir, f"{c}.csv")
            write_frame_csv(frame, path)
            out[c] = path
        return out

    path = os.path.join(out_dir, "outputs_sheet.xlsx")
    try:  # pragma: no cover - openpyxl absent in this sandbox
        import openpyxl  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(path, engine="openpyxl") as writer:
            for c, frame in frames.items():
                frame.toPandas().to_excel(
                    writer, sheet_name=c[:31], index=False
                )
                out[c] = path
        return out
    except ImportError:
        pass

    from information_extraction_t5_spark.sources.xlsx import write_workbook

    sheets = {
        c: (frame.columns, [list(r) for r in frame.collect()])
        for c, frame in frames.items()
    }
    write_workbook(path, sheets)
    return {c: path for c in classes}
