"""Compound-answer explosion + metric grouping keys (row kernels).

A compound prediction covers several subfields in one string.  For
per-subfield metrics the row is *exploded* into aligned (label, prediction)
sub-rows: the first prediction occurrence of each label typename is matched,
missing typenames yield '', derived example_ids get ``~typename`` /
``*`` suffixes, sub-row probabilities are zeroed, and ORIG/DISJOINT metric
cohorts become flag columns (Spark-side they were index lists in the
reference).  Reference: features/postprocess.py:16-246.
"""
from __future__ import annotations

import re
from typing import List, Optional

from information_extraction_t5_spark.core import parsing
from information_extraction_t5_spark.core.registry import TYPE_TO_TYPENAME


def _first_or_empty(items: List[str]) -> str:
    return items[0] if items else ""


def explode_row(
    label: str,
    prediction: str,
    document_id: str,
    example_id: str,
    prob: float,
    window_ids: str,
    keep_original_compound: bool = True,
    keep_disjoint_compound: bool = True,
) -> List[dict]:
    """Explode one scored row into original + per-subanswer metric rows.

    ``window_ids`` is the space-joined window-id string produced by the
    top-1-window stage (one id per prediction subanswer).  Output rows carry:

      is_original    -> row belongs to the ORIG cohort (answers as emitted)
      disjoint_class -> document class for the DISJOINT cohort, else None
      star           -> clue/SENT-stripped variant (example_id ends with '*')
    """
    wids = [int(w) for w in window_ids.split(" ")] if window_ids else []
    label_subs, label_tns = parsing.deconstruct(label)
    pred_subs, pred_tns = parsing.deconstruct(prediction)
    doc_class = example_id.split(".")[0]
    rows: List[dict] = []

    def emit(lab, pred, ex_id, p, wid, sids, raw, orig, disjoint):
        rows.append(
            {
                "label": lab,
                "prediction": pred,
                "document_id": document_id,
                "example_id": ex_id,
                "prob": p,
                "window_ids": wid,
                "sent_ids": sids,
                "raw_text": raw,
                "is_original": orig,
                "disjoint_class": disjoint,
            }
        )

    if len(label_tns) <= 1 or keep_original_compound:
        joined_label = " ".join(label_subs)
        joined_pred = " ".join(pred_subs)
        emit(
            joined_label, joined_pred, example_id, prob, wids,
            None, None, keep_original_compound, None,
        )
        if len(label_tns) <= 1:
            head_pred = _first_or_empty(pred_subs)
            emit(
                parsing.subanswer_of(joined_label),
                parsing.subanswer_of(joined_pred),
                example_id + "*",
                prob,
                wids,
                parsing.sent_ids(head_pred),
                parsing.raw_text_of(head_pred),
                False,
                doc_class if keep_disjoint_compound else None,
            )

    if len(label_tns) > 1:
        head_wid = wids[:1]  # compound rows replicate one window id
        for label_ss, label_tn in zip(label_subs, label_tns):
            try:
                pred_ss = pred_subs[pred_tns.index(label_tn)]
            except ValueError:
                pred_ss = ""
            emit(
                label_ss, pred_ss, f"{example_id}~{label_tn}", 0.0, head_wid,
                None, None, False, None,
            )
            emit(
                parsing.subanswer_of(label_ss),
                parsing.subanswer_of(pred_ss),
                f"{example_id}~{label_tn}*",
                0.0,
                head_wid,
                parsing.sent_ids(pred_ss),
                parsing.raw_text_of(pred_ss),
                False,
                doc_class if keep_disjoint_compound else None,
            )

    return rows


# Fast-path guard for star_triple_rows (r7): the canonical single-subanswer
# grammar the extractor emits — optional [SENTn] (numeric), one display
# clue (exactly RE_TYPE_CLUE's charset, nonempty), a value with no
# brackets/colons and no leading/trailing space, optional complement of the
# same shape.  Anything else (compounds, empty/colon/space-edge values,
# non-numeric SENT ids) falls through to the general component walk, so the
# fast path only ever handles strings whose parse is unambiguous.
_CLUE_CLASS = r"[A-Za-záàâãéèêíïóôõöúçñÁÀÂÃÉÈÍÏÓÔÕÖÚÇÑºª_ \/]"
_VAL = r"[^\s\[\]:](?:[^\[\]:]*[^\s\[\]:])?"

_RE_STAR_FAST = re.compile(
    r"^(?:\[SENT(\d+)\] )?"
    rf"\[({_CLUE_CLASS}+)\]: ({_VAL})"
    rf"(?: \[aparece no texto\] ({_VAL}))?$"
)


def star_triple_rows(
    pred_sentence: str,
    example_id: str,
    prob: float,
    window_id: int,
) -> List[tuple]:
    """Exactly the star-cohort rows the inference path keeps, in one pass.

    best_to_triples consumes only the ``*``-suffixed rows of
    explode_row(label=prediction, ...) and immediately drops N/A/empty
    objects — the generic kernel deconstructs the same sentence three
    times and builds the ORIG/typename metric rows just to discard them.
    This specialization (r7) deconstructs once and emits
    (example_base, obj, obj_raw, window_id, prob, sent_id) tuples, where
    example_base is example_id (single) or example_id~typename (compound
    sub-rows, prob zeroed like the metric cohort).  Row-for-row equal to
    the explode_row route by construction and pinned by
    tests/test_star_triple_rows.py.
    """
    m = _RE_STAR_FAST.fullmatch(pred_sentence)
    # a leading complement clue is NOT a plain name (raw_text_of splits on
    # it) — that shape takes the general walk
    if m is not None and m.group(2) != "aparece no texto":
        sid_s, clue, value, raw = m.groups()
        if clue not in TYPE_TO_TYPENAME:
            # same failure the general path raises inside type_clues
            raise ValueError(f"Unknown type name: {clue}")
        if value == "N/A":
            return []
        return [(
            example_id, value, raw, window_id, float(prob),
            int(sid_s) if sid_s is not None else -1,
        )]
    subs, tns = parsing.deconstruct(pred_sentence)
    rows: List[tuple] = []
    if len(tns) <= 1:
        joined = " ".join(subs)
        values = parsing.clean_answers(parsing.subanswer_of(joined))
        obj = values[0] if values else ""
        if obj and obj != "N/A":
            head = subs[0] if subs else ""
            sids = parsing.sent_ids(head)
            rows.append((
                example_id, obj, parsing.raw_text_of(head), window_id,
                float(prob), sids[0] if sids else -1,
            ))
        return rows
    for tn in tns:
        pred_ss = subs[tns.index(tn)]  # first occurrence, kernel semantics
        values = parsing.clean_answers(parsing.subanswer_of(pred_ss))
        obj = values[0] if values else ""
        if not obj or obj == "N/A":
            continue
        sids = parsing.sent_ids(pred_ss)
        rows.append((
            f"{example_id}~{tn}", obj, parsing.raw_text_of(pred_ss),
            window_id, 0.0, sids[0] if sids else -1,
        ))
    return rows


def group_keys(example_id: str, group_by_typenames: bool = True) -> List[str]:
    """Metric-rollup group keys for one example id.

    Every id groups under itself; non-``~`` ids also group under their
    document class; ``_N``-suffixed multi-chunk ids additionally group under
    the suffix-stripped id (preserving ``~typename`` / ``*`` markers).
    Reference: postprocess.py:16-70 (index lists become exploded keys).
    """
    keys: List[str] = []
    if group_by_typenames and "~" not in example_id:
        keys.append(example_id.split(".")[0])
    keys.append(example_id)

    if group_by_typenames:
        comp: Optional[str] = None
        base = example_id
        if "~" in example_id:
            base, comp = example_id.rsplit("~", 1)
        try:
            stem, tail = base.rsplit("_", 1)
            starred = tail.endswith("*")
            if comp is None and starred:
                tail = tail[:-1]
            int(tail.strip())  # only numeric suffixes group
            if comp is not None:
                stem += "~" + comp
            elif starred:
                stem += "*"
            keys.append(stem)
        except ValueError:
            pass

    return keys
