"""Text-normalization and formatting column expressions.

Pure-Catalyst (codegen'd) equivalents of the row kernels in
``core/textnorm.py``; each cites the reference behavior it reproduces.
UDF-free on purpose: at 100 TB these run inside WholeStageCodegen over the
parquet scan with filters/pruning pushed down.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Accented Latin chars and their ASCII folds — used for the expression-side
# accent strip (exact NFD semantics live in the Arrow UDF variant).
ACCENTED = "áàâãäåéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
FOLDED = "aaaaaaeeeeiiiiooooouuuucnyAAAAAAEEEEIIIIOOOOOUUUUCNY"
PUNCT = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""


def clean_document_text(col: Column) -> Column:
    """Document cleanup chain (reference: context.py:409-416 +
    basic_to_squad.py:226): tabs->spaces, collapse ws-wrapped newline runs,
    collapse repeated whitespace, fold tokenizer-hostile chars, trim.

    r7: the five literal/single-char rules run as replace/translate/btrim
    instead of regexp_replace — same output (the moved-up char folds touch
    no whitespace, so they commute with the two real regex rules; btrim's
    strip set is exactly Java's ASCII \\s), one regex scan fewer per rule.
    Pinned by the reference differential suite and
    test_textnorm.test_clean_document_text_expression_twin."""
    c = F.replace(col, F.lit("༡༨/༢"), F.lit(""))
    c = F.translate(c, "\t´", " '")
    c = F.replace(c, F.lit("™"), F.lit("TM"))
    c = F.replace(c, F.lit("…"), F.lit("..."))
    c = F.regexp_replace(c, r"\s*\n+\s*", "\n")
    c = F.regexp_replace(c, r"(\s)\1+", "$1")
    # Python str.strip() removes ALL whitespace; F.trim only spaces — a
    # trailing '\n' survives trim and shifts every window boundary (caught
    # by the r5 full-stage differential)
    return F.btrim(c, F.lit(" \t\n\x0b\f\r"))


def brackets_to_parens(col: Column) -> Column:
    """Reference: preprocess.py:19-23."""
    return F.translate(col, "{}", "()")


def newlines_to_spaces(col: Column) -> Column:
    """Reference: preprocess.py:70-81."""
    return F.regexp_replace(col, r"\n", " ")


def number_sentences(col: Column) -> Column:
    """Numbered ``[SENTi]`` tags via split -> indexed transform -> join —
    no UDF needed for the numbered-replace (reference: preprocess.py:37-67).
    """
    parts = F.split(brackets_to_parens(col), r"\n", -1)
    tagged = F.transform(
        parts,
        lambda s, i: F.concat(
            F.lit(" [SENT"), (i + 1).cast("string"), F.lit("] "), s
        ),
    )
    return F.array_join(tagged, "")


def sent_id_at(context: Column, position: Column) -> Column:
    """1-based sentence id of a char offset (-1 -> 0); counts newlines in the
    prefix (reference: preprocess.py:84-97)."""
    prefix = F.substring(context, 1, position)
    newlines = F.length(prefix) - F.length(F.regexp_replace(prefix, r"\n", ""))
    return F.when(position == -1, F.lit(0)).otherwise(newlines + 1)


def t5_input(context: Column, question: Column, use_sentence_id: bool) -> Column:
    """'question: {q} context: {c}' (reference: preprocess.py:253-270)."""
    ctx = number_sentences(context) if use_sentence_id else newlines_to_spaces(context)
    return F.concat(F.lit("question: "), question, F.lit(" context: "), ctx)


def typed_answer(display_type: Column, value: Column) -> Column:
    """'[Type]: value' with N/A for null values
    (reference: basic_to_squad.py:48,99,168-177)."""
    return F.concat(
        F.lit("["), display_type, F.lit("]: "), F.coalesce(value, F.lit("N/A"))
    )


def normalize_answer(col: Column) -> Column:
    """Expression-side SQuAD normalization (reference: metrics.py:14-37):
    lower, strip punctuation, fold accents (translate table), drop english
    articles, collapse whitespace.  Matches core.textnorm.normalize_answer
    for Latin-1 text; exotic scripts need the Arrow UDF variant."""
    c = F.lower(col)
    c = F.translate(c, PUNCT, "")
    c = F.translate(c, ACCENTED, FOLDED)
    c = F.regexp_replace(c, r"\b(a|an|the)\b", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def answer_tokens(col: Column) -> Column:
    """Normalized whitespace tokens (reference: metrics.py:40-43)."""
    norm = normalize_answer(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def na_count(col: Column) -> Column:
    """Occurrences of the 'N/A' marker (reference: postprocess.py:257)."""
    return F.size(F.split(col, "N/A", -1)) - 1


def count_occurrences(col: Column, literal: str) -> Column:
    """Occurrences of a literal substring via split-size."""
    return F.size(F.split(col, F.lit(literal), F.lit(-1))) - 1
