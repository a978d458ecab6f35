"""Migration-path sources: the reference's raw JSON (R1) and SQuAD (R2)
formats, including an end-to-end run over the reference's own fixture."""
import os

import pytest
from pyspark.sql import functions as F

from information_extraction_t5_spark.pipeline import run_pipeline
from information_extraction_t5_spark.sources.raw_json import (
    documents_to_transcripts,
    golden_triples_from_documents,
    read_raw_documents,
)
from information_extraction_t5_spark.sources.squad import (
    read_squad_jsonl,
    write_squad_json,
)

FIXTURE = "/root/reference/data/raw/sample_train.json"


@pytest.fixture(scope="module")
def ref_documents(spark):
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture not available")
    return read_raw_documents(spark, FIXTURE)


def test_read_raw_documents_shape(ref_documents):
    rows = {r["doc_id"]: r for r in ref_documents.collect()}
    assert set(rows) == {"318", "108", "965"}
    d = rows["318"]
    assert d["fields"]["agencia"] == "2347"
    assert d["endereco"]["cidade"] == "BARREIRAS"
    assert "Proposta de Abertura" in d["text"]


def test_transcripts_reconstruct_text(ref_documents):
    t = documents_to_transcripts(ref_documents)
    joined = (
        t.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("rebuilt")
        )
    )
    both = {r["doc_id"]: r for r in ref_documents.join(
        joined, ref_documents["doc_id"] == joined["conv_id"]).collect()}
    for doc_id, r in both.items():
        assert r["rebuilt"] == r["text"], doc_id


def test_pipeline_on_reference_fixture(spark, ref_documents):
    """End-to-end on the reference's own sample data: extracted triples vs
    the file's annotations.  The fixture itself contains label/text
    disagreements (doc 318 annotates agencia=2347 while its text prints
    1234), so the gate here is 0.85; the >=0.95 P/R gate runs on the
    noise-free synthetic corpus (test_pipeline_e2e)."""
    transcripts = documents_to_transcripts(ref_documents)
    triples = run_pipeline(spark, transcripts)
    got = triples.select("conv_id", "pred", "obj").distinct()
    golden = golden_triples_from_documents(ref_documents)
    tp = got.join(golden, ["conv_id", "pred", "obj"]).count()
    precision = tp / got.count()
    recall = tp / golden.count()
    assert precision >= 0.85, f"precision {precision}"
    assert recall >= 0.85, f"recall {recall}"


def test_squad_roundtrip(spark, tmp_path, ref_documents):
    from information_extraction_t5_spark.core.windows import WindowSpec
    from information_extraction_t5_spark.operators.windows import (
        sliding_windows_exact,
    )

    docs = ref_documents.select("doc_id", "text").withColumnRenamed(
        "doc_id", "conv_id"
    )
    windows = sliding_windows_exact(
        docs, WindowSpec(max_size=800, window_overlap=0.2, max_windows=4)
    )
    qa = windows.select(
        F.col("conv_id").alias("doc_id"), "window_id",
        "window_text",
        F.lit("form.agencia").alias("qa_id"),
        F.lit("Qual é o número da agência?").alias("question"),
        F.lit("[Agência]: N/A").alias("answer_text"),
        F.lit(-1).alias("answer_start"),
    )
    path = str(tmp_path / "squad")
    write_squad_json(qa, path)
    back = read_squad_jsonl(spark, path)
    assert back.count() == qa.count()
    a = sorted(map(tuple, qa.collect()))
    b = sorted(map(tuple, back.select(*qa.columns).collect()))
    assert a == b
