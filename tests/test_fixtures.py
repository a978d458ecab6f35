"""Committed oracle fixtures must equal the in-engine synthesizers row for
row — the DuckDB oracle reads these files while the Spark queries
re-synthesize, so any drift would silently break the flagship hash gates."""
import os

import duckdb
import pandas as pd

from information_extraction_t5_spark.data import synth

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_transcripts_fixture_matches_synth():
    con = duckdb.connect()
    fix = con.sql(
        f"select * from '{FIXDIR}/transcripts_n40.parquet' "
        "order by conv_id, turn_idx"
    ).df()
    live = synth.transcripts_pdf(40).sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert len(fix) == len(live)
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        got = fix[col].where(pd.notna(fix[col]), None).tolist()
        want = live[col].where(pd.notna(live[col]), None).tolist()
        assert got == want, col


def test_goldens_fixture_matches_synth():
    con = duckdb.connect()
    fix = con.sql(
        f"select * from '{FIXDIR}/golden_triples_n40.parquet' "
        "order by conv_id, pred"
    ).df()
    rows = []
    for cid in synth.conv_ids(40):
        rows.extend(synth.golden_triples(cid))
    live = pd.DataFrame(rows, columns=["conv_id", "pred", "obj"]).sort_values(
        ["conv_id", "pred"]
    ).reset_index(drop=True)
    assert fix[["conv_id", "pred", "obj"]].values.tolist() == \
        live.values.tolist()


def test_media_fixture_matches_synth(spark):
    from information_extraction_t5_spark.operators import multimodal as mm

    con = duckdb.connect()
    fix = con.sql(
        f"select media_id, kind, payload, meta "
        f"from '{FIXDIR}/media_48.parquet' order by media_id"
    ).fetchall()
    live = sorted(
        mm.synthetic_media_df(spark, n=48).collect(),
        key=lambda r: r["media_id"],
    )
    assert len(fix) == len(live) == 48
    for f, r in zip(fix, live):
        assert f[0] == r["media_id"]
        assert f[1] == r["kind"]
        assert bytes(f[2]) == bytes(r["payload"])
        assert f[3]["width"] == r["meta"]["width"]
        assert f[3]["height"] == r["meta"]["height"]
        assert f[3]["duration_ms"] == r["meta"]["duration_ms"]
