"""Differential tests that need a SparkSession: reference pandas stages as
oracles for the Spark operators.

Covers the flagship top-1-window selection (reference
features/postprocess.py:249-288 ``get_highest_probability_window``) against
``operators/postprocess.top1_window``, and the pos/neg balance counting
(reference utils/balance_data.py:8-27 ``count_pos_neg``) against the Spark
aggregation, on seeded randomized inputs.
"""
from __future__ import annotations

import os
import random
import sys

import pytest

REFERENCE_ROOT = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

ref_postprocess = pytest.importorskip(
    "information_extraction_t5.features.postprocess",
    reason="reference repo not importable in this environment",
)
from information_extraction_t5.utils import balance_data as ref_balance

from pyspark.sql import functions as F

from information_extraction_t5_spark.operators.postprocess import top1_window

_PRED_POOL = [
    "[Estado]: SP",
    "[Estado]: N/A",
    "[Agência]: 2347",
    "[CPF/CNPJ]: N/A",
    "[Logradouro]: Rua Azul [Número]: 12",
    "[Logradouro]: N/A [Número]: N/A",
    "[Cidade]: Campinas [Estado]: SP",
    "[Nome]: Ana Maria",
]


def _random_rows(seed: int, n_groups: int):
    """Per (doc, ex) group: 1-5 windows with unique probs (ties would pit
    the reference's unstable quicksort against the deterministic
    window_id tiebreak — not a semantics difference)."""
    r = random.Random(seed)
    labels, preds, docs, exs, probs = [], [], [], [], []
    for g in range(n_groups):
        doc = f"s{seed}_d{r.randint(0, 3)}"
        ex = f"s{seed}_e{g}"
        n = r.randint(1, 5)
        ps = r.sample(range(1000), n)
        for i in range(n):
            labels.append(r.choice(_PRED_POOL))
            preds.append(r.choice(_PRED_POOL))
            docs.append(doc)
            exs.append(ex)
            probs.append(ps[i] / 1000.0)
    return labels, preds, docs, exs, probs


@pytest.mark.parametrize("use_fewer_na", [True, False])
def test_top1_window_matches_reference(spark, use_fewer_na):
    cases = [_random_rows(seed, 40) for seed in (3, 11)]

    # reference oracle: per seed batch, keyed by (doc, ex)
    expected = {}
    for labels, preds, docs, exs, probs in cases:
        (r_labels, r_preds, r_docs, r_exs, r_probs,
         r_wids) = ref_postprocess.get_highest_probability_window(
            labels, preds, docs, exs, probs, use_fewer_NA=use_fewer_na,
        )
        for lab, pred, doc, ex, prob, wid in zip(
            r_labels, r_preds, r_docs, r_exs, r_probs, r_wids
        ):
            # first token of the replicated cumcount string = window id
            expected[(doc, ex)] = (lab, pred, float(prob),
                                   int(wid.split(" ")[0]))

    # Spark side: one DF for all seeds; window_id = input order per group
    rows = []
    for labels, preds, docs, exs, probs in cases:
        counter: dict = {}
        for lab, pred, doc, ex, prob in zip(labels, preds, docs, exs, probs):
            wid = counter.get((doc, ex), 0)
            counter[(doc, ex)] = wid + 1
            rows.append((doc, ex, wid, lab, pred, prob))
    df = spark.createDataFrame(
        rows,
        "conv_id string, qa_id string, window_id int, label string, "
        "prediction string, prob double",
    )
    got = {
        (r["conv_id"], r["qa_id"]): (
            r["label"], r["prediction"], r["prob"], r["window_id"]
        )
        for r in top1_window(df, use_fewer_na=use_fewer_na).collect()
    }
    assert got == expected


@pytest.mark.parametrize("fixture", ["sample_train.json", "sample_test.json"])
def test_raw_scan_matches_reference_loader(spark, fixture):
    """sources/raw_json vs the reference's own load_raw_data
    (data/file_handling.py:31-51) on the reference's shipped fixtures:
    same ids, texts, scalar fields, and endereco subfields."""
    from information_extraction_t5.data.file_handling import load_raw_data

    from information_extraction_t5_spark.sources.raw_json import (
        ADDRESS_SUBFIELDS,
        read_raw_documents,
    )

    path = os.path.join(REFERENCE_ROOT, "data", "raw", fixture)
    if not os.path.exists(path):
        pytest.skip(f"{fixture} not shipped")
    raw, documents, fname = load_raw_data(path)
    assert fname == path and list(raw.items()) == documents

    rows = {r["doc_id"]: r
            for r in read_raw_documents(spark, path).collect()}
    assert set(rows) == {str(k) for k in raw}
    for doc_id, doc in raw.items():
        got = rows[str(doc_id)]
        assert got["text"] == doc.get("text", doc.get("texto", ""))
        for k, v in doc.items():
            if isinstance(v, str) and k not in ("text", "texto"):
                assert got["fields"][k] == v
        addr = doc.get("endereco") or {}
        for sf in ADDRESS_SUBFIELDS:
            assert got["endereco"][sf] == addr.get(sf)


@pytest.mark.parametrize("suffix,mode", [("tar", "w"), ("tar.gz", "w:gz")])
def test_tar_archive_scan(spark, tmp_path, suffix, mode):
    """.tar/.tar.gz dataset ingest mirrors the reference's decompress
    entry (file_handling.py:8-28): archive the reference fixture, read it
    back through read_raw_documents, equal to the direct-JSON read."""
    import tarfile

    from information_extraction_t5_spark.sources.raw_json import (
        read_raw_documents,
    )

    src = os.path.join(REFERENCE_ROOT, "data", "raw", "sample_train.json")
    if not os.path.exists(src):
        pytest.skip("fixture not shipped")
    archive = str(tmp_path / f"ds.{suffix}")
    with tarfile.open(archive, mode) as tar:
        tar.add(src, arcname="sample_train.json")

    direct = read_raw_documents(spark, src).orderBy("doc_id").collect()
    from_tar = read_raw_documents(spark, archive).orderBy("doc_id").collect()
    assert from_tar == direct and len(direct) > 0


def test_count_pos_neg_matches_reference(spark):
    r = random.Random(23)
    labels, docs, exs = [], [], []
    for i in range(300):
        labels.append(r.choice(_PRED_POOL))
        docs.append(f"d{r.randint(0, 5)}")
        exs.append(f"e{r.randint(0, 7)}")

    n_pos, n_neg, counter = ref_balance.count_pos_neg(labels, docs, exs)

    sdf = spark.createDataFrame(
        list(zip(docs, exs, labels)),
        "document_ids string, example_ids string, label string",
    )
    neg = F.col("label").contains("N/A")
    agg = sdf.agg(
        F.sum(F.when(neg, 1).otherwise(0)).alias("neg"),
        F.sum(F.when(~neg, 1).otherwise(0)).alias("pos"),
    ).head()
    assert (agg["pos"], agg["neg"]) == (n_pos, n_neg)

    # per-(doc, example) counts == the reference's nested counter dict
    per_group = (
        sdf.groupBy("document_ids", "example_ids")
        .agg(
            F.sum(F.when(~neg, 1).otherwise(0)).alias("pos"),
            F.sum(F.when(neg, 1).otherwise(0)).alias("neg"),
        )
    )
    got = {(r["document_ids"], r["example_ids"]): (r["pos"], r["neg"])
           for r in per_group.collect()}
    exp = {(doc, ex): (c["pos"], c["neg"])
           for doc, exs_ in counter.items() for ex, c in exs_.items()}
    assert got == exp
