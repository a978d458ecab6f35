"""Unit + plan guards for the corpus-quality operators
(operators/quality.py) and the greedy sequence packer
(operators/packing.py).  Oracle parity of the planted driver gates is
covered by tools/check_oracle.py; these tests pin the semantics on
hand-checkable inputs and the scale-critical plan shapes (per-row stats
must stay shuffle- and Python-free)."""
import io
import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from information_extraction_t5_spark.operators.packing import (
    pack_occupancy,
    pack_sequences,
)
from information_extraction_t5_spark.operators.quality import (
    pii_stats,
    repetition_stats,
    url_domain_stats,
)


def _plan(df) -> str:
    buf, old = io.StringIO(), sys.stdout
    sys.stdout = buf
    df.explain("formatted")
    sys.stdout = old
    return buf.getvalue()


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_known_values(spark):
    # 4 lines: 'x y' three times (2 duplicate occurrences of 3 chars
    # each), 'a b a b' once.  2-gram 'x y' occurs 3x in the whitespace
    # token stream... count from the flattened words:
    # words = [a b a b x y x y x y]; 'a b' 2x(len3), 'b a' 1, 'b x' 1,
    # 'y x' 2x(len3), 'x y' 3x(len3) -> top = 9/len(text)
    text = "a b a b\nx y\nx y\nx y"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = repetition_stats(df).collect()[0]
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == pytest.approx(2 / 4)
    # line chars: 7 + 3*3 = 16; duplicated occurrences: 2*3 = 6
    assert r["dup_line_char_frac"] == pytest.approx(6 / 16, abs=1e-6)
    assert r["top_2gram_char_frac"] == pytest.approx(9 / len(text), abs=1e-6)
    # 5-grams of 10 words: 6 grams, all distinct -> 0
    assert r["dup_5gram_char_frac"] == 0.0


def test_repetition_degenerate(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "w w w w w w w w w w")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["top_2gram_char_frac"] == 0.0
    assert rows[2]["dup_line_char_frac"] == 0.0
    # 'w w' occurs 9x, len 3 -> 27/19 capped nowhere (top frac may
    # exceed 1 on pathological overlap; that is the documented
    # definition), dup-5gram IS capped at 1.0
    assert rows[3]["dup_5gram_char_frac"] == 1.0


def test_empty_text_word_split_oracle_parity(spark):
    """ADVICE r5: DuckDB's string_split_regex(trim(''),'\\s+') yields ['']
    where Spark-side _words yields [] — the oracle SQL now guards empty
    text with an explicit CASE.  Pins both engines' behavior on the exact
    fragment the gopher/repetition/curation oracles embed, so the guard
    can't silently rot."""
    import duckdb

    from information_extraction_t5_spark.operators.quality import _words

    # the raw divergence the guard exists for
    raw = duckdb.sql(
        r"select string_split_regex(trim(''), '\s+')").fetchone()[0]
    assert raw == [""]
    guarded = duckdb.sql(
        r"""select case when trim(t) = '' then cast([] as varchar[])
                   else string_split_regex(trim(t), '\s+') end
            from (values (''), ('  '), ('a  b')) v(t)"""
    ).fetchall()
    assert [g[0] for g in guarded] == [[], [], ["a", "b"]]
    # Spark side agrees row-for-row
    df = spark.createDataFrame([("",), ("  ",), ("a  b",)], ["t"])
    got = [r[0] for r in df.select(_words(F.col("t"))).collect()]
    assert got == [[], [], ["a", "b"]]


def test_repetition_plan_is_shuffle_and_python_free(spark):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id int, text string")
    plan = _plan(repetition_stats(df))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    text = ("write First.Last+tag@sub.Example.ORG, ping 192.168.0.1 "
            "or call +55 (11) 91234-5678 now")
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = pii_stats(df).collect()[0]
    assert (r["email_count"], r["ipv4_count"], r["phone_like_count"]) == (
        1, 1, 1)
    assert "<EMAIL>" in r["redacted"]
    assert "<IP>" in r["redacted"]
    assert "<PHONE>" in r["redacted"]
    assert "192.168" not in r["redacted"]
    assert "@" not in r["redacted"]


def test_pii_plan_is_shuffle_and_python_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = _plan(pii_stats(df))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame(
        [(1, "no personal data here at all")], "doc_id int, text string"
    )
    r = pii_stats(df).collect()[0]
    assert r["redacted"] == "no personal data here at all"
    assert r["email_count"] == r["ipv4_count"] == r["phone_like_count"] == 0


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------


def test_url_normalization_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "a HTTPS://WWW.Ex.COM:443/Path/ b"),
            (2, "a https://www.ex.com/Path c"),
            (3, "x http://ex.com:8080/q#frag y"),
            (4, "no urls at all"),
        ],
        "doc_id int, text string",
    )
    rows = {r["domain"]: r for r in url_domain_stats(df).collect()}
    # doc1 and doc2 normalize to the SAME url (case, :443, trailing /)
    assert rows["www.ex.com"]["n_urls"] == 2
    assert rows["www.ex.com"]["n_distinct_urls"] == 1
    # :8080 is not a default port and survives; fragment stripped
    assert rows["ex.com"]["n_urls"] == 1
    assert set(rows) == {"www.ex.com", "ex.com"}


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _greedy_oracle(sizes, max_units):
    acc, pid, out = 0, 0, []
    for s in sizes:
        if acc > 0 and acc + s > max_units:
            pid += 1
            acc = 0
        out.append(pid)
        acc += s
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1,
             max_size=30),
    st.sampled_from([16, 50, 100]),
)
def test_packing_matches_greedy_oracle(spark, sizes, max_units):
    rows = [("g", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(
        rows, "source string, doc_id int, n_tokens int"
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(df, "source", "doc_id", "n_tokens",
                                max_units).collect()
    }
    want_ids = _greedy_oracle(sizes, max_units)
    pos, last = 0, None
    for i, pid in enumerate(want_ids):
        pos = pos + 1 if pid == last else 0
        last = pid
        assert got[i] == (pid, pos), (i, sizes, max_units)


def test_packing_invariants(spark):
    df = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 70), ("a", 3, 200), ("a", 4, 10),
         ("b", 1, 5)],
        "source string, doc_id int, n_tokens int",
    )
    packed = pack_sequences(df, max_units=128)
    rows = sorted(
        packed.collect(), key=lambda r: (r["source"], r["doc_id"])
    )
    # 60 | 70 -> overflow -> pack 1; 200 oversized alone -> pack 2;
    # 10 -> pack 3 (greedy never revisits earlier packs)
    assert [r["pack_id"] for r in rows if r["source"] == "a"] == [0, 1, 2, 3]
    # groups pack independently
    assert [r["pack_id"] for r in rows if r["source"] == "b"] == [0]
    # no pack except oversized singletons exceeds the budget
    occ = pack_occupancy(packed, max_units=128).collect()
    assert all(0 < r["mean_fill"] <= 1.0 for r in occ)


# ---------------------------------------------------------------------------
# gopher composite filter
# ---------------------------------------------------------------------------


def test_gopher_filter_rules(spark):
    from information_extraction_t5_spark.operators.quality import (
        gopher_filter,
    )

    long_ok = " ".join(f"word{i}" for i in range(30))
    rows = [
        (1, long_ok),                       # passes everything
        (2, "too few words"),               # fails word floor
        (3, long_ok + "\n" + long_ok),      # ~50% duplicated line chars
        (4, " ".join(["a b c d e"] * 12)),  # duplicated 5-grams
        (5, " ".join(["zz"] * 25)),         # mean word length 2 < 3
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in gopher_filter(df).collect()}
    assert out[1]["keep"] and all(out[1][k] for k in
                                  ("words_ok", "mwl_ok", "dup_line_ok",
                                   "dup_5gram_ok"))
    assert not out[2]["words_ok"] and not out[2]["keep"]
    # repeated-line doc trips BOTH duplicate-content rules (the repeated
    # words also repeat every 5-gram) but none of the word-shape rules
    assert not out[3]["dup_line_ok"] and not out[3]["dup_5gram_ok"]
    assert out[3]["words_ok"] and out[3]["mwl_ok"]
    assert not out[4]["dup_5gram_ok"]
    assert not out[5]["mwl_ok"] and out[5]["words_ok"]
    assert out[5]["dup_line_ok"]  # single line, no line dup


def test_gopher_plan_is_shuffle_and_python_free(spark):
    from information_extraction_t5_spark.operators.quality import (
        gopher_filter,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = _plan(gopher_filter(df).filter("keep"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
