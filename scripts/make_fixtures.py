"""Materialize the deterministic synthetic inputs as committed parquet
fixtures so the DuckDB oracle can read the SAME rows the Spark queries
synthesize (VERDICT r2 item 3: hash-gate the flagship pipeline).

The fixtures are pure functions of (n, seed) — regenerate with
``python scripts/make_fixtures.py`` and the bytes may change but the VALUES
never do (pinned by tests/test_fixtures.py).
"""
from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from information_extraction_t5_spark.data import synth  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")

N_CONVS = 40
N_MEDIA = 48


def write_transcripts() -> str:
    pdf = synth.transcripts_pdf(N_CONVS)
    # column order + arrow types matching TRANSCRIPTS_SCHEMA
    table = pa.table(
        {
            "conv_id": pa.array(pdf["conv_id"], pa.string()),
            "turn_idx": pa.array(pdf["turn_idx"], pa.int32()),
            "role": pa.array(pdf["role"], pa.string()),
            "text": pa.array(pdf["text"], pa.string()),
            "tool": pa.array(pdf["tool"], pa.string()),
            "ts": pa.array(pdf["ts"], pa.timestamp("us", tz="UTC")),
        }
    )
    path = os.path.join(FIXDIR, f"transcripts_n{N_CONVS}.parquet")
    pq.write_table(table, path)
    return path


def write_goldens() -> str:
    rows = []
    for cid in synth.conv_ids(N_CONVS):
        rows.extend(synth.golden_triples(cid))
    table = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    path = os.path.join(FIXDIR, f"golden_triples_n{N_CONVS}.parquet")
    pq.write_table(table, path)
    return path


def write_media() -> str:
    # mirrors operators/multimodal.synthetic_media_df(n=48, seed=42)
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(N_MEDIA):
        ids.append(f"m_{i:05d}")
        kinds.append(["image", "audio", "video"][i % 3])
        payloads.append(hashlib.sha256(f"42:{i}".encode()).digest() * 8)
        metas.append(
            {
                "width": 64 + i % 512,
                "height": 64 + (i * 7) % 512,
                "duration_ms": 1000 + i,
                "codec": "fake",
            }
        )
    meta_type = pa.struct(
        [("width", pa.int32()), ("height", pa.int32()),
         ("duration_ms", pa.int32()), ("codec", pa.string())]
    )
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, meta_type),
        }
    )
    path = os.path.join(FIXDIR, f"media_{N_MEDIA}.parquet")
    pq.write_table(table, path)
    return path


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    for p in (write_transcripts(), write_goldens(), write_media()):
        print("wrote", p)
