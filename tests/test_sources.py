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


def test_convert_dataset_cli(spark, tmp_path):
    """scripts/convert_dataset.py — the reference's
    convert_dataset_to_squad CLI re-expressed on Spark: raw JSON in,
    train/valid/test SQuAD JSON-lines out.  Checks the split is disjoint
    and exhaustive, valid/test carry forced-N/A qas while the unforced
    train does not, and the files round-trip through read_squad_jsonl."""
    import json
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import convert_dataset

    raw = {}
    for i in range(20):
        raw[f"doc{i:03d}"] = {
            "text": f"Nome Completo Pessoa {i}\nUF SP\nConta Corrente "
                    f"00{i:02d}-1\n" + "linha de contexto extra " * 10,
            "nome_completo": f"Pessoa {i}",
            "cpf": f"{i:03d}.000.000-00",
            "endereco": {"estado": "SP", "cidade": f"Cidade {i}"},
        }
    src = tmp_path / "raw.json"
    src.write_text(json.dumps(raw), encoding="utf-8")

    out = {n: str(tmp_path / f"{n}.json")
           for n in ("train", "valid", "test")}
    counters = convert_dataset.main([
        "--raw-data-file", str(src),
        "--train-file", out["train"],
        "--valid-file", out["valid"],
        "--test-file", out["test"],
        "--type-names", "form.nome_completo", "form.cpf", "form.endereco",
        "--max-size", "300", "--max-windows", "2",
        "--valid-percent", "0.3",
    ])
    assert counters["train"] > 0 and counters["valid"] > 0
    assert counters["test"] == counters["valid"]  # no test file: reuse

    train = read_squad_jsonl(spark, out["train"])
    valid = read_squad_jsonl(spark, out["valid"])
    train_docs = {r["doc_id"] for r in
                  train.select("doc_id").distinct().collect()}
    valid_docs = {r["doc_id"] for r in
                  valid.select("doc_id").distinct().collect()}
    assert train_docs and valid_docs
    assert not (train_docs & valid_docs)           # disjoint
    assert train_docs | valid_docs == set(raw)     # exhaustive

    # valid forces the full N/A universe (12 qa_ids per window); the
    # unforced train carries only the 3 configured ones
    per_window_valid = (
        valid.groupBy("doc_id", "window_id").count().collect()
    )
    assert all(r["count"] == 12 for r in per_window_valid)
    per_window_train = (
        train.groupBy("doc_id", "window_id").count().collect()
    )
    assert all(r["count"] == 3 for r in per_window_train)
    configured = {"form.nome_completo", "form.cpf", "form.endereco"}
    valid_ids = {r["qa_id"] for r in
                 valid.select("qa_id").distinct().collect()}
    train_ids = {r["qa_id"] for r in
                 train.select("qa_id").distinct().collect()}
    assert len(valid_ids) == 12 and configured < valid_ids  # forced N/A
    assert train_ids == configured  # unforced: only annotated qa_ids
    # forced rows are pure-N/A answers; annotated compound answers may
    # carry per-subfield N/A (missing logradouro etc.) — that's the
    # reference's own answer grammar, not a forced qa
    forced = valid.filter(~F.col("qa_id").isin(*configured))
    assert forced.count() > 0
    assert forced.filter(
        ~F.col("answer_text").rlike(r"^\[[^]]+\]: N/A$")
    ).count() == 0


def test_distributed_raw_ingest_matches_driver_path(spark, tmp_path):
    """read_raw_documents_distributed (executor-side parse, one task per
    file) must produce exactly the driver-side shim's rows — over a
    multi-file directory AND over the reference's own single fixture."""
    import json

    from information_extraction_t5_spark.sources.raw_json import (
        read_raw_documents_distributed,
    )

    d = tmp_path / "rawdir"
    d.mkdir()
    files = {
        "a.json": {
            "doc_a1": {"text": "linha um\nlinha dois",
                       "nome_completo": "ANA LIMA",
                       "endereco": {"cidade": "Campinas", "estado": "SP"}},
            "doc_a2": {"texto": "um texto", "cpf": "111.222.333-44"},
        },
        "b.json": {
            "doc_b1": {"text": "outro documento",
                       "nome_completo": "BOB REIS",
                       "endereco": {"cep": "13000-000"}},
        },
    }
    for fn, payload in files.items():
        (d / fn).write_text(json.dumps(payload))

    dist = read_raw_documents_distributed(spark, str(d))
    # same rows as the driver path applied file-by-file
    want = []
    for fn in files:
        want += sorted(
            map(tuple, read_raw_documents(spark, str(d / fn)).collect())
        )
    got = sorted(map(tuple, dist.collect()))
    assert got == sorted(want)
    assert dist.columns == ["doc_id", "text", "fields", "endereco"]
    # parallelism is per-file: the scan carries one task per input file
    assert dist.rdd.getNumPartitions() >= 2

    if os.path.exists(FIXTURE):
        a = sorted(map(tuple,
                       read_raw_documents(spark, FIXTURE).collect()))
        b = sorted(map(tuple, read_raw_documents_distributed(
            spark, FIXTURE).collect()))
        assert a == b
