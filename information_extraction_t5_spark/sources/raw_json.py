"""Reader for the reference's raw document JSON (R1 shape).

The reference stores a dataset as one JSON object keyed by document id,
each value holding scalar string fields, an optional nested ``endereco``
dict, and a ``text`` blob (reference: data/file_handling.py:31-51,
data/raw/sample_train.json).  A user of the reference points this reader at
the same files and gets the engine's tables:

  - ``documents(doc_id, text, fields map<string,string>,
      endereco struct<...>)`` — the FIXTURES.md F2 shape;
  - ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` — the
    authoritative input shape, one turn per text line (line order is the
    stable ordering key, so per-turn equality reconstructs the blob).

Two ingest paths (r6): ``read_raw_documents`` is a driver-side parse for
one small file (the reference's datasets are single JSON files);
``read_raw_documents_distributed`` handles a directory/glob of files via
``spark.read.text(wholetext=True)`` + mapInPandas — each file parses on
an executor, the driver never touches a payload.  Raw R1 ingest is a
migration path, not the hot path (transcripts are the authoritative
input).
"""
from __future__ import annotations

import datetime as dt
import json
import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from information_extraction_t5_spark.core.registry import DEFAULT_PREDICATES

ADDRESS_FIELD = "endereco"
ADDRESS_SUBFIELDS = ["logradouro", "numero", "complemento", "bairro",
                     "cidade", "estado", "cep"]

DOCUMENTS_SCHEMA = (
    "doc_id string, text string, fields map<string,string>, "
    "endereco struct<" + ",".join(f"{c}:string" for c in ADDRESS_SUBFIELDS)
    + ">"
)

_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def extract_raw_archive(path: str, out_dir: Optional[str] = None) -> str:
    """Unpack a ``.tar``/``.tar.gz`` dataset archive and return the newest
    contained JSON file (reference: data/file_handling.py:8-28 —
    ``decompress``; the reference globs ``data/raw/*json`` and takes the
    last, this takes the lexicographically-last extracted ``*.json`` so
    behavior is deterministic and directory-independent)."""
    import glob
    import tarfile
    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="raw_untar_")
    mode = "r:gz" if path.endswith("tar.gz") else "r:"
    with tarfile.open(path, mode) as tar:
        tar.extractall(out_dir, filter="data")
    found = sorted(glob.glob(os.path.join(out_dir, "**", "*json"),
                             recursive=True))
    if not found:
        raise FileNotFoundError(f"no JSON file inside archive {path}")
    return found[-1]


def read_raw_documents(spark: SparkSession, path: str) -> DataFrame:
    """Parse a reference raw-JSON dataset into the documents table
    (``.tar``/``.tar.gz`` archives are unpacked first, mirroring the
    reference's load_raw_data entry; file_handling.py:40-44).

    Archive detection requires a real ``.tar``/``.tar.gz`` suffix — the
    reference's own endswith('tar') quirk would misroute e.g. 'nectar.json'
    to tarfile (ADVICE r4), and this loader already deviates from the
    reference in deterministic glob order, so parity-with-the-bug buys
    nothing."""
    if path.endswith((".tar", ".tar.gz")):
        path = extract_raw_archive(path)
    with open(path) as f:
        raw = json.load(f)
    return spark.createDataFrame(
        _docs_to_rows(raw.items()), DOCUMENTS_SCHEMA
    )


def _docs_to_rows(doc_items):
    """Shared R1-object -> documents-row kernel (driver and distributed
    paths parse identically by construction)."""
    rows = []
    for doc_id, doc in doc_items:
        text = doc.get("text", doc.get("texto", ""))
        fields = {
            k: v for k, v in doc.items()
            if isinstance(v, str) and k not in ("text", "texto")
        }
        addr = doc.get(ADDRESS_FIELD) or {}
        endereco = tuple(addr.get(c) for c in ADDRESS_SUBFIELDS)
        rows.append((str(doc_id), text, fields, endereco))
    return rows


def read_raw_documents_distributed(spark: SparkSession,
                                   paths: str) -> DataFrame:
    """Executor-side R1 ingest: one task per JSON FILE (VERDICT r5 —
    the scale path the driver-side shim documents).

    ``spark.read.text(..., wholetext=True)`` ships each file's bytes to
    an executor; a mapInPandas stage json-parses there — the driver never
    holds a payload.  Parallelism is per-file (the R1 format is one
    top-level dict per file, so a single file is irreducibly one parse
    task — at 100 GB you split the export into many files, which is how
    the reference's own data/raw/*.json directory glob already shapes
    it).  Archives are not auto-extracted here: unpack once with
    extract_raw_archive, then point this at the directory."""
    import pandas as pd

    text_df = spark.read.text(paths, wholetext=True)

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "text": [], "fields": [], "endereco": []}
            for blob in pdf["value"]:
                for doc_id, text, fields, endereco in _docs_to_rows(
                    json.loads(blob).items()
                ):
                    out["doc_id"].append(doc_id)
                    out["text"].append(text)
                    out["fields"].append(fields)
                    out["endereco"].append(
                        dict(zip(ADDRESS_SUBFIELDS, endereco))
                    )
            yield pd.DataFrame(out)

    return text_df.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def documents_to_transcripts(documents: DataFrame) -> DataFrame:
    """documents -> transcripts: one turn per line, roles alternating,
    deterministic timestamps.  '\\n'.join(turns by turn_idx) == text."""
    from pyspark.sql import functions as F

    lines = documents.select(
        F.col("doc_id").alias("conv_id"),
        F.posexplode(F.split("text", r"\n", -1)).alias("turn_idx", "text"),
    )
    return lines.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.when(F.col("turn_idx") % 2 == 0, "user")
        .otherwise("assistant").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        (
            F.lit(_EPOCH) + F.make_interval(secs=F.col("turn_idx") * 37)
        ).alias("ts"),
    )


def golden_triples_from_documents(documents: DataFrame) -> DataFrame:
    """The (conv_id, pred, obj) triples the raw file annotates — scalar
    fields from the map, address subfields from the struct."""
    from pyspark.sql import functions as F

    scalar_fields = [
        p.field for p in DEFAULT_PREDICATES if not p.is_compound
    ]
    scalars = (
        documents.select(
            F.col("doc_id").alias("conv_id"),
            F.explode("fields").alias("field", "obj"),
        )
        .filter(F.col("field").isin(scalar_fields))
        .select(
            "conv_id",
            F.concat(F.lit("form."), F.col("field")).alias("pred"),
            "obj",
        )
    )
    addr_cols = [
        documents.select(
            F.col("doc_id").alias("conv_id"),
            F.lit(f"form.endereco.{c}").alias("pred"),
            F.col(f"endereco.{c}").alias("obj"),
        )
        for c in ADDRESS_SUBFIELDS
    ]
    addr = addr_cols[0]
    for a in addr_cols[1:]:
        addr = addr.unionByName(a)
    return scalars.unionByName(addr.filter(F.col("obj").isNotNull()))
