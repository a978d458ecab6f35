"""The DuckDB window-kernel replications must match the Python kernel
window-for-window on every fixture document (the SQL side is the oracle
for the flagship kg_exact_windows / kg_token_windows hash gates)."""
import re

import duckdb
import pandas as pd

from information_extraction_t5_spark.core.windows import (
    WindowSpec,
    sliding_windows,
    sliding_windows_token,
)
from information_extraction_t5_spark.data import synth
from information_extraction_t5_spark.oracle_sql import (
    char_windows_sql,
    token_windows_sql,
)


def _clean_py(t: str) -> str:
    # mirrors functions/text.clean_document_text (Java regex semantics)
    t = t.replace("༡༨/༢", "")
    t = re.sub(r"\t", " ", t)
    t = re.sub(r"\s*\n+\s*", "\n", t)
    t = re.sub(r"(\s)\1+", r"\1", t)
    t = t.replace("´", "'").replace("™", "TM").replace("…", "...")
    return t.strip()  # full-whitespace strip, == reference str.strip()


def _docs(n=40):
    for cid in synth.conv_ids(n):
        turns = sorted(
            synth.conversation_turns(cid), key=lambda x: x["turn_idx"]
        )
        yield cid, _clean_py("\n".join(t["text"] for t in turns))


def _compare(py_rows, sql):
    py = pd.DataFrame(
        py_rows,
        columns=["conv_id", "window_id", "window_text", "window_offset"],
    )
    con = duckdb.connect()
    sq = con.sql(sql).df()
    merged = py.merge(
        sq, on=["conv_id", "window_id"], suffixes=("_p", "_s"),
        how="outer", indicator=True,
    )
    bad = merged[
        (merged["_merge"] != "both")
        | (merged.window_text_p != merged.window_text_s)
        | (merged.window_offset_p != merged.window_offset_s)
    ]
    assert len(py) == len(sq)
    assert len(bad) == 0, bad.head(3).to_dict("records")


def test_char_windows_sql_matches_kernel():
    spec = WindowSpec(max_size=700, window_overlap=0.2, max_windows=6,
                      question="Qual o endereço?", use_sentence_id=True)
    rows = [
        (cid, w.window_id, w.text, w.offset)
        for cid, text in _docs()
        for w in sliding_windows(text, spec)
    ]
    _compare(rows, char_windows_sql())


def test_token_windows_sql_matches_kernel():
    rows = [
        (cid, w.window_id, w.text, w.offset)
        for cid, text in _docs()
        for w in sliding_windows_token(
            text, max_tokens=120, window_overlap=0.2, max_windows=6,
            question="Qual o endereço?", use_sentence_id=True,
        )
    ]
    _compare(rows, token_windows_sql())
