"""FULL-STAGE R3 differential: the reference's post-inference stage —
``get_highest_probability_window(use_fewer_NA=True)`` ->
``split_compound_labels_and_predictions`` -> ``group_qas`` (both
groupings) + ORIG/DISJOINT cohorts -> ``t5_qa_evaluate`` per group —
exactly as ``models/qa_model.py:213-312`` composes it, run end-to-end as
the oracle against the Spark postprocess lineage ``top1_window ->
explode_compound -> with_group_keys -> score -> eval_rollup``.

Prior rounds pinned each piece per-function
(tests/test_reference_differential.py: split_compound full-row equality,
group_qas, metrics kernels; tests/test_reference_differential_spark.py:
top1 both use_fewer_NA modes).  This suite pins the COMPOSITION on
hypothesis-fuzzed prediction tables — multi-window doc/typename groups,
compound labels with [SENT]/raw-text complements, N/A mixes, prob ties —
asserting (a) the post-split row set (label, prediction, ids, prob,
window_ids, sent_ids, raw_text, ORIG flag, DISJOINT class) and (b) every
metric group the reference writes to metrics_by_typenames.json /
metrics_by_documents.json (per-key exact/f1/total, the ORIG cohort,
DISJOINT_<class> and DISJOINT_ALL) match.

Reference quirk pinned here: ``make_eval_dict`` (utils/metrics.py:66-69)
treats an EMPTY qid list as "no list" and silently reports the GLOBAL
metrics for that key — so when no row is disjoint-eligible the
reference's DISJOINT_ALL equals the global rollup while the Spark side
correctly emits no such group.  The test asserts the quirk instead of
replicating it.
"""
from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

REFERENCE_ROOT = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

pytest.importorskip(
    "information_extraction_t5.features.postprocess",
    reason="reference repo not importable in this environment",
)
from information_extraction_t5.features import postprocess as ref_postprocess
from information_extraction_t5.utils import metrics as ref_metrics

from information_extraction_t5_spark.core import registry
from information_extraction_t5_spark.functions.metrics import eval_rollup, score
from information_extraction_t5_spark.operators.postprocess import (
    explode_compound,
    top1_window,
    with_group_keys,
)

# --------------------------------------------------------------------------
# strategies: a fuzzed prediction table as the inference stage emits it —
# one row per (doc, typename, window), labels shared per group, window id
# = the reference's groupby-cumcount (input order within the group)
# --------------------------------------------------------------------------

_VALUE = st.text(alphabet="abcdef 012.-ç", min_size=1, max_size=12).filter(
    lambda s: s.strip()
)
_CLUE = st.sampled_from(sorted(registry.TYPE_TO_TYPENAME))
_CLASSES = ("form", "matriculas")


@st.composite
def _answer(draw):
    kind = draw(st.integers(min_value=0, max_value=3))
    if kind == 0:
        return "N/A"
    n = 1 if kind < 3 else draw(st.integers(min_value=2, max_value=3))
    pieces = []
    for _ in range(n):
        p = ""
        if draw(st.booleans()):
            p += f"[SENT{draw(st.integers(min_value=0, max_value=30))}] "
        p += f"[{draw(_CLUE)}]: {draw(_VALUE)}"
        if draw(st.booleans()):
            p += f" [{registry.COMPLEMENT_TYPE}] {draw(_VALUE)}"
        pieces.append(p)
    return " ".join(pieces)


@st.composite
def _example_id(draw):
    base = draw(st.sampled_from(_CLASSES))
    base += "." + draw(st.sampled_from(["endereco", "cpf", "estado", "x"]))
    if draw(st.booleans()):
        base += "_" + draw(st.sampled_from(["0", "1", "12"]))
    return base + draw(st.sampled_from(["", "*", "~estado", "~cidade*"]))


@st.composite
def prediction_table(draw):
    rows = []
    for di in range(draw(st.integers(min_value=1, max_value=3))):
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            ex = draw(_example_id())
            lab = draw(_answer())
            for _ in range(draw(st.integers(min_value=1, max_value=3))):
                pick = draw(st.integers(min_value=0, max_value=2))
                pred = lab if pick == 0 else draw(_answer())
                prob = draw(
                    st.floats(min_value=0.0, max_value=1.0,
                              allow_nan=False)
                )
                rows.append((lab, pred, f"doc_{di}", ex, prob))
    return rows


def _with_cumcount(rows):
    """window_id = occurrence index within (doc, example) in input order —
    byte-equal to the reference's ``groupby(...).cumcount()``
    (postprocess.py:272-273)."""
    seen: dict = {}
    out = []
    for lab, pred, doc, ex, prob in rows:
        wid = seen.get((doc, ex), 0)
        seen[(doc, ex)] = wid + 1
        out.append((lab, pred, doc, ex, prob, wid))
    return out


# --------------------------------------------------------------------------
# reference oracle: qa_model.test_epoch_end's exact composition
# --------------------------------------------------------------------------

def _reference_chain(rows):
    labels = [r[0] for r in rows]
    preds = [r[1] for r in rows]
    docs = [r[2] for r in rows]
    exs = [r[3] for r in rows]
    probs = [r[4] for r in rows]
    (l, p, d, e, pr, w) = ref_postprocess.get_highest_probability_window(
        labels, preds, docs, exs, probs, use_fewer_NA=True
    )
    (l, p, d, e, pr, w, sids, raws, orig_idx,
     disjoint) = ref_postprocess.split_compound_labels_and_predictions(
        l, p, d, e, pr, w
    )
    qid_t = ref_postprocess.group_qas(e, group_by_typenames=True)
    qid_d = ref_postprocess.group_qas(d, group_by_typenames=False)
    qid_t["ORIG"] = orig_idx
    qid_d["ORIG"] = orig_idx
    all_idx: list = []
    for cls, idxs in disjoint.items():
        qid_t["DISJOINT_" + cls] = idxs
        qid_d["DISJOINT_" + cls] = idxs
        all_idx += idxs
    qid_t["DISJOINT_ALL"] = all_idx
    qid_d["DISJOINT_ALL"] = all_idx
    res_t = ref_metrics.t5_qa_evaluate(l, p, qid_dict=qid_t)
    res_d = ref_metrics.t5_qa_evaluate(l, p, qid_dict=qid_d)
    rowset = (l, p, d, e, pr, w, sids, raws, set(orig_idx), disjoint)
    return rowset, res_t, res_d, qid_t, qid_d


def _flatten(res: dict, qid_dict: dict) -> dict:
    """{key: (exact, f1, total)} for every NON-EMPTY group; asserts the
    empty-list quirk (global metrics leak into the key) on empty ones."""
    out = {"__global__": (res["exact"], res["f1"], res["total"])}
    for key, sub in res.items():
        if not isinstance(sub, dict):
            continue
        if qid_dict.get(key):
            out[key] = (sub["exact"], sub["f1"], sub["total"])
        else:  # metrics.py:66-69 falsy-empty quirk
            assert (sub["exact"], sub["f1"], sub["total"]) == (
                res["exact"], res["f1"], res["total"])
    return out


# --------------------------------------------------------------------------
# Spark lineage
# --------------------------------------------------------------------------

def _aggs():
    return [
        F.round(F.avg("exact") * 100.0, 6).alias("exact"),
        F.round(F.avg("f1") * 100.0, 6).alias("f1"),
        F.count(F.lit(1)).alias("total"),
    ]


def _norm_cell(v):
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        return tuple(int(x) for x in v)
    if v is None or pd.isna(v):
        return None
    return v


def _spark_chain(spark, rows_wid):
    df = spark.createDataFrame(
        rows_wid,
        schema="label string, prediction string, conv_id string, "
               "qa_id string, prob double, window_id int",
    )
    best = top1_window(df, use_fewer_na=True)
    exploded = explode_compound(best).cache()
    scored = score(exploded)

    def keyed(col, by_typenames):
        out = {}
        for r in (
            eval_rollup(with_group_keys(scored, col, by_typenames))
            .collect()
        ):
            if r["group_key"] is not None:  # rollup global overcounts
                out[r["group_key"]] = (r["exact"], r["f1"], r["total"])
        return out

    by_t = keyed("example_id", True)
    by_d = keyed("document_id", False)

    # cohort metrics in one shuffle: every row contributes to __global__,
    # ORIG rows to ORIG, disjoint rows to their class and DISJOINT_ALL
    cohort_keys = F.array_compact(
        F.array(
            F.lit("__global__"),
            F.when(F.col("is_original"), F.lit("ORIG")),
            F.when(
                F.col("disjoint_class").isNotNull(),
                F.concat(F.lit("DISJOINT_"), F.col("disjoint_class")),
            ),
            F.when(
                F.col("disjoint_class").isNotNull(), F.lit("DISJOINT_ALL")
            ),
        )
    )
    cohorts = {
        r["k"]: (r["exact"], r["f1"], r["total"])
        for r in scored.withColumn("k", F.explode(cohort_keys))
        .groupBy("k").agg(*_aggs()).collect()
    }

    pdf = exploded.toPandas()
    exploded.unpersist()
    rowset = [
        (
            r.label, r.prediction, r.document_id, r.example_id, r.prob,
            _norm_cell(r.window_ids), _norm_cell(r.sent_ids),
            None if pd.isna(r.raw_text) else r.raw_text,
            bool(r.is_original),
            None if pd.isna(r.disjoint_class) else r.disjoint_class,
        )
        for r in pdf.itertuples()
    ]
    return rowset, by_t, by_d, cohorts


def _assert_metrics_equal(got: dict, want: dict):
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k, (we, wf, wt) in want.items():
        ge, gf, gt = got[k]
        assert gt == wt, (k, gt, wt)
        assert ge == pytest.approx(we, abs=1e-6), (k, ge, we)
        assert gf == pytest.approx(wf, abs=1e-6), (k, gf, wf)


SETTINGS = settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@SETTINGS
@given(prediction_table())
def test_full_stage3_matches_reference(spark, rows):
    rows_wid = _with_cumcount(rows)
    (rl, rp_, rd, re_, rpr, rw, rsids, rraws, orig_set,
     disjoint), res_t, res_d, qid_t, qid_d = _reference_chain(rows)

    cls_of = {}
    for cls, idxs in disjoint.items():
        for i in idxs:
            cls_of[i] = cls
    want_rows = sorted(
        (
            rl[i], rp_[i], rd[i], re_[i], rpr[i],
            _norm_cell(rw[i]), _norm_cell(rsids[i]), rraws[i],
            i in orig_set, cls_of.get(i),
        )
        for i in range(len(rl))
    )

    got_rows, by_t, by_d, cohorts = _spark_chain(spark, rows_wid)
    assert sorted(got_rows) == want_rows

    want_t = _flatten(res_t, qid_t)
    want_d = _flatten(res_d, qid_d)
    _assert_metrics_equal(cohorts,
                          {k: v for k, v in want_t.items()
                           if k == "__global__" or k == "ORIG"
                           or k.startswith("DISJOINT_")})
    _assert_metrics_equal(by_t,
                          {k: v for k, v in want_t.items()
                           if k != "__global__" and k != "ORIG"
                           and not k.startswith("DISJOINT_")})
    _assert_metrics_equal(by_d,
                          {k: v for k, v in want_d.items()
                           if k != "__global__" and k != "ORIG"
                           and not k.startswith("DISJOINT_")})


def test_stage3_known_case(spark):
    """Deterministic smoke: two docs, one compound + one simple typename,
    two windows each — hand-checkable and independent of hypothesis."""
    lab_c = "[SENT1] [Estado]: SP [SENT2] [Cidade]: Campinas"
    rows = [
        (lab_c, "N/A N/A", "doc_0", "form.endereco", 0.9),
        (lab_c, lab_c, "doc_0", "form.endereco", 0.4),
        ("[CPF/CNPJ]: 123", "[CPF/CNPJ]: 123", "doc_0", "form.cpf_1", 0.8),
        ("[CPF/CNPJ]: 123", "[CPF/CNPJ]: 999", "doc_0", "form.cpf_1", 0.9),
        ("N/A", "N/A", "doc_1", "form.estado", 0.5),
    ]
    rows_wid = _with_cumcount(rows)
    (rl, *_rest), res_t, res_d, qid_t, qid_d = _reference_chain(rows)
    got_rows, by_t, by_d, cohorts = _spark_chain(spark, rows_wid)

    # fewer-N/A beats probability: window 1 (prob 0.4, zero N/As) wins for
    # form.endereco over window 0 (prob 0.9, 'N/A N/A'); the split remaps
    # clue names to typenames, so match on content not the raw label
    orig_endereco = [r for r in got_rows
                     if r[3] == "form.endereco" and r[8]]
    assert len(orig_endereco) == 1
    assert "Campinas" in orig_endereco[0][1]
    assert orig_endereco[0][5] == (1, 1)  # winning window id, replicated
    assert len(got_rows) == len(rl)
    _assert_metrics_equal(by_t, {k: v for k, v in _flatten(
        res_t, qid_t).items() if k != "__global__" and k != "ORIG"
        and not k.startswith("DISJOINT_")})
    assert cohorts["__global__"][2] == len(rl)
