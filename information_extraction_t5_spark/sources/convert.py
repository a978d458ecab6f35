"""R1 -> R2 conversion: raw documents table -> flat qa_windows rows.

The reference converts raw JSON documents into SQuAD-format QA data with a
per-document Python loop (reference: data/basic_to_squad.py:196-319
``get_document_data`` driven by data/convert_dataset_to_squad.py:18-102
``convert_raw_data``/``convert_document``).  Here the same semantics are one
declarative lineage:

    documents (doc_id, text, fields map, <compound structs>)
      -> clean_document_text        codegen'd normalize chain
                                    (context.py:409-416 + basic_to_squad:226)
      -> sliding windows            Arrow kernel, char or token budget,
                                    parity-pinned (context.py:133-341)
      -> x broadcast(qa spec)       the static question/ordering plan:
                                    annotated qa_ids in type_names order,
                                    then forced-N/A qa_ids sorted
                                    (basic_to_squad.py:253-317)
      -> answers as expressions     simple '[Type]: value' from the fields
                                    map; compound subfield signatures from
                                    the struct with per-subfield N/A fill
                                    (basic_to_squad.py:48,95-114,162-177)
      -> windows >< doc_qas         one conv_id-keyed shuffle join

Scale shape: the qa spec is a handful of rows (always broadcast); answer
construction is WholeStageCodegen over the document scan; the only shuffle
is the final windows-to-answers join on the document key, which AQE
skew-splits if a conversation is hot.  Nothing is per-row Python except the
window kernel already required for byte parity.

Differentially fuzzed end-to-end against the reference's own
``get_document_data`` (ast-loaded, transformers-free) in
tests/test_reference_differential_e2e.py: question text, answer text,
answer_start, paragraph contexts, qa ordering and the forced-N/A set all
match per paragraph.
"""
from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from information_extraction_t5_spark.core.registry import (
    DEFAULT_PREDICATES,
    Predicate,
    TYPENAME_TO_TYPE,
    na_answer,
)
from information_extraction_t5_spark.core.windows import WindowSpec
from information_extraction_t5_spark.functions.text import (
    clean_document_text,
)
from information_extraction_t5_spark.operators.windows import (
    sliding_windows_exact,
    sliding_windows_token_exact,
)

# The reference budgets every window for its longest question
# (basic_to_squad.py:218: ``largest_question``), regardless of which
# question each qa row ends up asking.
LARGEST_QUESTION = (
    "Quais são as principais informações do documento de publicação?"
)

QA_SPEC_SCHEMA = (
    "qa_idx int, qa_id string, field string, display_type string, "
    "is_compound boolean, is_na boolean, na_answer string, "
    "question string, questions array<string>, variant_idx int"
)


def qa_spec_rows(
    predicates: Optional[List[Predicate]] = None,
    type_names: Optional[List[str]] = None,
    all_qa_ids: Optional[List[str]] = None,
    choose: str = "first",
    project: Optional[str] = None,
) -> List[tuple]:
    """The static per-document QA plan, as rows for a broadcast frame.

    Mirrors the control flow of get_document_data (basic_to_squad.py:
    253-317): annotated qa_ids are visited in ``type_names`` order
    (filtered to ``project``), each contributing one row per selected
    question; the forced not-applicable block follows, sorted by qa_id,
    always using the FIRST question (the reference hardcodes
    choose_question='first' for N/A qas "to avoid using too much
    negatives", basic_to_squad.py:303).  ``qa_idx`` is the paragraph-order
    position, so downstream consumers can reproduce the reference's exact
    qa ordering.
    """
    preds = DEFAULT_PREDICATES if predicates is None else predicates
    by_id = {p.qa_id: p for p in preds}
    if type_names is None:
        type_names = [p.qa_id for p in preds]
    if all_qa_ids is None:
        all_qa_ids = [p.qa_id for p in preds]

    rows: List[tuple] = []
    satisfied: List[str] = []
    for qa_id in type_names:
        p = by_id[qa_id]
        if project is not None and p.project != project:
            continue
        satisfied.append(qa_id)
        questions = list(p.questions) if choose == "all" else [p.questions[0]]
        for vi, q in enumerate(questions):
            rows.append((
                len(rows), p.qa_id, p.field,
                None if p.is_compound else TYPENAME_TO_TYPE[p.field],
                p.is_compound, False, None, q, list(p.questions), vi,
            ))
    for qa_id in sorted(set(all_qa_ids) - set(satisfied)):
        p = by_id[qa_id]
        rows.append((
            len(rows), p.qa_id, p.field, None, p.is_compound, True,
            na_answer(p), p.questions[0], list(p.questions), 0,
        ))
    return rows


def _answer_expr(predicates: List[Predicate],
                 fields_col: str = "fields") -> F.Column:
    """Answer text as one codegen'd CASE expression.

    N/A rows carry their literal in the spec; compound rows assemble the
    subfield signature '[Type]: value' pieces with per-subfield N/A fill
    (basic_to_squad.py:95-114); simple rows read the fields map
    (basic_to_squad.py:32-48 — the reference KeyErrors on a missing field,
    this yields NULL answer_text: filter or fail upstream, don't mask).
    """
    ans = F.when(F.col("is_na"), F.col("na_answer"))
    for p in predicates:
        if not p.is_compound:
            continue
        pieces = [
            F.concat(
                F.lit(f"[{TYPENAME_TO_TYPE[sf]}]: "),
                F.coalesce(F.col(p.field)[sf], F.lit("N/A")),
            )
            for sf in p.subfields
        ]
        ans = ans.when(
            (~F.col("is_na")) & (F.col("qa_id") == p.qa_id),
            F.concat_ws(" ", *pieces),
        )
    return ans.otherwise(
        F.concat(
            F.lit("["), F.col("display_type"), F.lit("]: "),
            F.element_at(F.col(fields_col), F.col("field")),
        )
    )


def documents_to_qa_windows(
    documents: DataFrame,
    spec: Optional[WindowSpec] = None,
    mode: str = "windows",
    predicates: Optional[List[Predicate]] = None,
    type_names: Optional[List[str]] = None,
    all_qa_ids: Optional[List[str]] = None,
    choose: str = "first",
    seed: int = 13,
    project: Optional[str] = None,
    max_tokens: int = 512,
    tokenizer_name: Optional[str] = None,
    doc_col: str = "doc_id",
) -> DataFrame:
    """documents -> flat qa_windows (R2) rows, reference-parity.

    Input: the documents table (``doc_col``, text, fields map, plus one
    struct column per compound predicate named after its field).  Output
    one row per (window, qa): doc_id, window_id, window_offset,
    window_text, qa_idx, qa_id, question, answer_text, answer_start.
    ``answer_start`` is -1 throughout — the reference does not ground
    answers at conversion time (basic_to_squad.py:52).

    ``mode``: 'windows' (char budget, reference context_content='windows')
    or 'windows_token' (token budget, the reference's shipped
    params.yaml:56 config).  Window budgets always reserve space for
    LARGEST_QUESTION, as the reference does.

    ``choose``: 'first' | 'all' reproduce the reference exactly;
    'random' draws per (document, qa_id) via a seeded md5 — deterministic
    and engine-portable where the reference consumes numpy global state
    (documented deviation, same as operators.extraction.expand_questions).

    Documents whose qa plan is empty (no annotated or forced qa_ids for
    ``project``) drop out entirely, matching the reference's
    ``counter_qas > 0`` guard (basic_to_squad.py:315-317).
    """
    spec = spec or WindowSpec(
        max_size=2048, window_overlap=0.2, max_windows=3,
        question=LARGEST_QUESTION, use_sentence_id=False,
    )
    preds = DEFAULT_PREDICATES if predicates is None else predicates
    spark = documents.sparkSession

    compound_cols = [p.field for p in preds if p.is_compound]
    docs = documents.select(
        F.col(doc_col).alias("conv_id"),
        clean_document_text(F.col("text")).alias("text"),
        "fields", *compound_cols,
    )

    if mode == "windows":
        windows = sliding_windows_exact(docs, spec)
    elif mode == "windows_token":
        windows = sliding_windows_token_exact(
            docs, max_tokens=max_tokens,
            window_overlap=spec.window_overlap,
            max_windows=spec.max_windows,
            question=spec.question,
            use_sentence_id=spec.use_sentence_id,
            tokenizer_name=tokenizer_name,
        )
    else:
        raise ValueError(f"unknown conversion mode: {mode}")

    spec_df = spark.createDataFrame(
        qa_spec_rows(preds, type_names, all_qa_ids, choose, project),
        QA_SPEC_SCHEMA,
    )

    doc_qas = docs.crossJoin(F.broadcast(spec_df))
    if choose == "random":
        idx = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("conv_id"), F.col("qa_id"),
                                      F.lit(str(seed)))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint"),
            F.size("questions").cast("bigint"),
        ).cast("int")
        doc_qas = doc_qas.withColumn(
            "variant_idx", F.when(F.col("is_na"), F.lit(0)).otherwise(idx)
        ).withColumn(
            "question",
            F.when(F.col("is_na"), F.col("question")).otherwise(
                F.element_at("questions", F.col("variant_idx") + 1)
            ),
        )
    doc_qas = doc_qas.select(
        "conv_id", "qa_idx", "qa_id", "question",
        _answer_expr(preds).alias("answer_text"),
        F.lit(-1).alias("answer_start"),
    )

    return windows.join(doc_qas, "conv_id").select(
        F.col("conv_id").alias("doc_id"),
        "window_id", "window_offset", "window_text",
        "qa_idx", "qa_id", "question", "answer_text", "answer_start",
    )
