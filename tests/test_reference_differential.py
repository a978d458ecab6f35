"""Differential fuzzing: the reference's own Python functions as oracles.

The reference modules ``information_extraction_t5.features.{preprocess,
sentences,postprocess}`` and ``.utils.{metrics,processing}`` import cleanly
without torch/transformers, so they can be run side-by-side with the Spark
kernels on hypothesis-generated inputs.  This is strictly stronger evidence
than the ported doctests: any divergence is a real parity bug.

Each comparison captures (value | exception-type) on both sides and asserts
they agree, so raise-behavior parity is checked too.

Reference functions exercised (all file:line into /root/reference):
  - features/sentences.py:36-52   find_sub_answers
  - features/sentences.py:55-74   find_ids_of_sent_tokens
  - features/sentences.py:89-107  find_type_names
  - features/sentences.py:120-153 split_t5_sentence_into_components
  - features/sentences.py:156-171 check_sent_id_is_valid
  - features/sentences.py:174-227 deconstruct_answer
  - features/sentences.py:230-299 get_{subanswer,raw_answer}_from_subsentence,
                                  get_clean_answer_from_subanswer
  - features/preprocess.py:37-97  _replace_linebreaks_with_{tokens,spaces},
                                  _get_id_based_on_linebreaks
  - features/preprocess.py:253-321 generate_t5_{input,label}_sentence
  - features/postprocess.py:16-70 group_qas
  - features/postprocess.py:73-246 split_compound_labels_and_predictions
  - utils/metrics.py:14-63        normalize_answer, get_tokens, compute_exact,
                                  compute_f1
  - utils/metrics.py:104-131      t5_qa_evaluate
  - utils/processing.py:8-14      get_intersection_set
"""
from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

REFERENCE_ROOT = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

ref = pytest.importorskip(
    "information_extraction_t5.features.sentences",
    reason="reference repo not importable in this environment",
)
from information_extraction_t5.features import postprocess as ref_postprocess
from information_extraction_t5.features import preprocess as ref_preprocess
from information_extraction_t5.features.questions import type_map as ref_type_map
from information_extraction_t5.utils import metrics as ref_metrics
from information_extraction_t5.utils import processing as ref_processing

from information_extraction_t5_spark.core import (
    compound,
    fuzzy,
    parsing,
    registry,
    textnorm,
)

SETTINGS = settings(max_examples=150, deadline=None)

# ---------------------------------------------------------------------------
# input strategies
# ---------------------------------------------------------------------------

# Fragment text: accented letters, digits, common punctuation — everything
# except the grammar's delimiters ([, ]) and str.format's braces ({, }),
# which upstream stages remove (preprocess.py:19-23) before these kernels run.
_FRAG_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "áàâãéèêíïóôõöúçñÁÂÃÉÍÓÔÕÚÇ0123456789 .,:;/-ºª'\n\t"
)

fragment = st.text(alphabet=_FRAG_ALPHABET, min_size=0, max_size=24)
nonempty_fragment = st.text(
    alphabet=_FRAG_ALPHABET.replace("\n", "").replace("\t", ""),
    min_size=1, max_size=24,
).filter(lambda s: s.strip())

known_clue = st.sampled_from(sorted(registry.TYPE_TO_TYPENAME))
unknown_clue = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz _/", min_size=1, max_size=12
).filter(lambda s: s not in registry.TYPE_TO_TYPENAME)

sent_token = st.one_of(
    st.integers(min_value=0, max_value=9999).map(lambda n: f"[SENT{n}]"),
    st.sampled_from(["[SENT]", "[SENTx]", "[SENT 2]"]),  # junk ids pass through
)
clue_token = known_clue.map(lambda c: f"[{c}]")
any_clue_token = st.one_of(clue_token, unknown_clue.map(lambda c: f"[{c}]"))


def _join_tokens(tokens):
    return " ".join(tokens)


# A "T5 sentence" with only clues the registry knows (map_type=True safe).
t5_sentence = st.lists(
    st.one_of(sent_token, clue_token.map(lambda c: c + ":"), nonempty_fragment),
    min_size=0, max_size=10,
).map(_join_tokens)

# A T5 sentence that may contain unknown clues (raise-parity inputs).
t5_sentence_any = st.lists(
    st.one_of(sent_token, any_clue_token, nonempty_fragment),
    min_size=0, max_size=10,
).map(_join_tokens)

context_text = st.text(alphabet=_FRAG_ALPHABET, min_size=0, max_size=120)


def outcome(fn, *args, **kwargs):
    """(True, value) on success, (False, exception type) on raise."""
    try:
        return True, fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 — raise-parity needs the class
        return False, type(e)


def assert_same(ref_fn, spark_fn, *args, **kwargs):
    ok_r, val_r = outcome(ref_fn, *args, **kwargs)
    ok_s, val_s = outcome(spark_fn, *args, **kwargs)
    if ok_r != ok_s:
        raise AssertionError(
            f"raise-behavior diverges on {args!r}: reference -> "
            f"{val_r if ok_r else val_r.__name__}, spark -> "
            f"{val_s if ok_s else val_s.__name__}"
        )
    if ok_r:
        assert val_r == val_s, f"value diverges on {args!r}: {val_r!r} != {val_s!r}"
    else:
        assert val_r is val_s, f"exception class diverges on {args!r}"


# ---------------------------------------------------------------------------
# registry parity (precondition for everything map-dependent)
# ---------------------------------------------------------------------------

def test_type_maps_identical():
    assert registry.TYPE_TO_TYPENAME == ref_type_map.TYPE_TO_TYPENAME
    assert registry.TYPENAME_TO_TYPE == ref_type_map.TYPENAME_TO_TYPE
    assert registry.COMPLEMENT_TYPE == ref_type_map.COMPLEMENT_TYPE


def test_registry_matches_reference_configured_universe():
    """DEFAULT_PREDICATES == the reference's EFFECTIVE extraction schema:
    get_all_qa_ids over the type_names its own params.yaml enables
    (params.yaml:32-48; form.doc_id_uf is dormant there — it has no
    TYPENAME_TO_TYPE entry and would KeyError the answer builder), with
    per-qa_id question lists and the compound subfield signature order
    (questions.py:23-94)."""
    params_type_names = [
        "form.etiqueta", "form.agencia", "form.conta_corrente", "form.cpf",
        "form.nome_completo", "form.n_doc_serie", "form.orgao_emissor",
        "form.data_emissao", "form.data_nascimento", "form.nome_mae",
        "form.nome_pai", "form.endereco",
    ]
    ref_ids = ref_preprocess.get_all_qa_ids(
        "form", params_type_names,
        list_of_use_compound_question=["form.endereco"],
    )
    assert ref_ids == registry.all_qa_ids()

    by_id = {p.qa_id: p for p in registry.DEFAULT_PREDICATES}
    for qa_id in ref_ids:
        field = qa_id.split(".", 1)[1]
        entry = ref_preprocess.ALL_QUESTIONS["form"][field]
        mine = by_id[qa_id]
        if isinstance(entry, dict):  # compound: signature order matters
            assert mine.is_compound
            assert mine.questions == entry["compound"]
            assert mine.subfields == [k for k in entry if k != "compound"]
        else:
            assert not mine.is_compound
            assert mine.questions == entry


# ---------------------------------------------------------------------------
# sentences.py kernels
# ---------------------------------------------------------------------------

@SETTINGS
@given(t5_sentence_any)
def test_fragments(sentence):
    assert_same(ref.find_sub_answers, parsing.fragments, sentence)


@SETTINGS
@given(t5_sentence_any)
def test_sent_ids(sentence):
    assert_same(ref.find_ids_of_sent_tokens, parsing.sent_ids, sentence)


@SETTINGS
@given(t5_sentence_any)
def test_type_clues_unmapped(sentence):
    assert_same(
        lambda s: ref.find_type_names(s, map_type=False),
        lambda s: parsing.type_clues(s, map_to_typename=False),
        sentence,
    )


@SETTINGS
@given(t5_sentence_any)
def test_type_clues_mapped_raise_parity(sentence):
    assert_same(ref.find_type_names, parsing.type_clues, sentence)


@SETTINGS
@given(t5_sentence)
def test_split_components(sentence):
    assert_same(
        ref.split_t5_sentence_into_components, parsing.split_components, sentence
    )


@SETTINGS
@given(context_text, st.integers(min_value=-3, max_value=12))
def test_sent_id_valid(context, sid):
    assert_same(ref.check_sent_id_is_valid, parsing.sent_id_is_valid, context, sid)


@SETTINGS
@given(t5_sentence)
def test_deconstruct(sentence):
    assert_same(ref.deconstruct_answer, parsing.deconstruct, sentence)


@SETTINGS
@given(t5_sentence)
def test_subanswer_of(sentence):
    assert_same(
        ref.get_subanswer_from_subsentence, parsing.subanswer_of, sentence
    )


@SETTINGS
@given(t5_sentence)
def test_raw_text_of(sentence):
    assert_same(
        ref.get_raw_answer_from_subsentence, parsing.raw_text_of, sentence
    )


@SETTINGS
@given(t5_sentence)
def test_clean_answers(sentence):
    assert_same(
        ref.get_clean_answer_from_subanswer, parsing.clean_answers, sentence
    )


# ---------------------------------------------------------------------------
# preprocess.py kernels
# ---------------------------------------------------------------------------

@SETTINGS
@given(context_text)
def test_number_sentences(text):
    assert_same(
        ref_preprocess._replace_linebreaks_with_tokens,
        textnorm.number_sentences,
        text,
    )


@SETTINGS
@given(context_text)
def test_newlines_to_spaces(text):
    assert_same(
        ref_preprocess._replace_linebreaks_with_spaces,
        textnorm.newlines_to_spaces,
        text,
    )


@SETTINGS
@given(context_text, st.integers(min_value=-1, max_value=150))
def test_sent_id_at(context, pos):
    assert_same(
        ref_preprocess._get_id_based_on_linebreaks, textnorm.sent_id_at,
        context, pos,
    )


@SETTINGS
@given(context_text, nonempty_fragment, st.booleans())
def test_t5_input(context, question, use_sentence_id):
    assert_same(
        ref_preprocess.generate_t5_input_sentence,
        textnorm.t5_input,
        context, question, use_sentence_id,
    )


# Compound answers as basic_to_squad emits them: '[Clue]: value ' pieces with
# an optional '[aparece no texto] raw' complement after a piece
# (basic_to_squad.py:48,104-114); answer_start has one offset per piece.
# Separators between pieces vary ('', ' ', '  ') and the starts list may be
# truncated or extended — whitespace preservation and the IndexError on a
# short list are part of the reference's observable behavior
# (preprocess.py:292-310) and were the first divergences this harness found.
@st.composite
def compound_answer(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    pieces, starts = [], []
    sep = draw(st.sampled_from(["", " ", "  "]))
    for _ in range(n):
        clue = draw(known_clue)
        value = draw(nonempty_fragment)
        pieces.append(f"[{clue}]: {value}")
        starts.append(draw(st.integers(min_value=-1, max_value=119)))
        if draw(st.booleans()):
            raw = draw(nonempty_fragment)
            pieces.append(f"[{registry.COMPLEMENT_TYPE}] {raw}")
            starts.append(draw(st.integers(min_value=-1, max_value=119)))
    skew = draw(st.sampled_from([0, 0, 0, -1, 1]))  # mostly aligned
    if skew < 0 and len(starts) > 1:
        starts = starts[:-1]
    elif skew > 0:
        starts = starts + [0]
    return sep.join(pieces), starts


@SETTINGS
@given(context_text, compound_answer())
def test_t5_label_compound(context, answer_and_starts):
    answer, starts = answer_and_starts
    assert_same(
        ref_preprocess.generate_t5_label_sentence,
        textnorm.t5_label,
        answer, starts, context, True,
    )


@SETTINGS
@given(
    context_text,
    nonempty_fragment,
    st.one_of(st.just(None), st.integers(min_value=-1, max_value=119)),
    st.booleans(),
)
def test_t5_label_simple(context, answer, start, use_sentence_id):
    assert_same(
        ref_preprocess.generate_t5_label_sentence,
        textnorm.t5_label,
        answer, start, context, use_sentence_id,
    )


# ---------------------------------------------------------------------------
# metrics.py kernels
# ---------------------------------------------------------------------------

metric_text = st.text(
    alphabet=_FRAG_ALPHABET + "!?\"()[]%$&*", min_size=0, max_size=40
)


@SETTINGS
@given(metric_text)
def test_normalize_answer(s):
    assert_same(ref_metrics.normalize_answer, textnorm.normalize_answer, s)


@SETTINGS
@given(metric_text)
def test_get_tokens(s):
    assert_same(ref_metrics.get_tokens, textnorm.answer_tokens, s)


@SETTINGS
@given(metric_text, metric_text)
def test_compute_exact(gold, pred):
    assert_same(ref_metrics.compute_exact, textnorm.exact_match, gold, pred)


@SETTINGS
@given(metric_text, metric_text)
def test_compute_f1(gold, pred):
    ok_r, val_r = outcome(ref_metrics.compute_f1, gold, pred)
    ok_s, val_s = outcome(textnorm.token_f1, gold, pred)
    assert ok_r and ok_s
    assert val_r == pytest.approx(val_s)


@SETTINGS
@given(st.lists(st.tuples(metric_text, metric_text), min_size=1, max_size=8))
def test_t5_qa_evaluate_rollup(pairs):
    answers = [a for a, _ in pairs]
    preds = [p for _, p in pairs]
    expected = ref_metrics.t5_qa_evaluate(answers, preds)
    exact = sum(textnorm.exact_match(a, p) for a, p in pairs)
    f1 = sum(textnorm.token_f1(a, p) for a, p in pairs)
    assert expected["total"] == len(pairs)
    assert expected["exact"] == pytest.approx(100.0 * exact / len(pairs))
    assert expected["f1"] == pytest.approx(100.0 * f1 / len(pairs))


# ---------------------------------------------------------------------------
# processing.py
# ---------------------------------------------------------------------------

@SETTINGS
@given(
    st.lists(st.integers(0, 20), max_size=12),
    st.lists(st.integers(0, 20), max_size=12),
)
def test_intersection_set(a, b):
    assert sorted(ref_processing.get_intersection_set(a, b)) == sorted(
        set(a) & set(b)
    )


# accented + plain text exercising every composite group member
_ACCENT_TEXT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzáàâãéêíóõúüç0123456789 -",
    min_size=0, max_size=30,
)


@SETTINGS
@given(_ACCENT_TEXT)
def test_expand_composite_chars(text):
    assert_same(
        ref_processing.expand_composite_char_pattern,
        fuzzy.expand_composite_chars,
        text,
    )


_nested_config = st.recursive(
    st.one_of(st.integers(0, 9), st.text(max_size=4), st.booleans()),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=4), children,
                        max_size=4),
        st.tuples(children, children),
    ),
    max_leaves=20,
)


@SETTINGS
@given(_nested_config)
def test_count_k_v(config):
    assert registry.count_keys_values(config) == \
        ref_processing.count_k_v(config)


@SETTINGS
@given(st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0-9", min_size=1, max_size=8),
    min_size=1, max_size=5,
))
def test_concat_or_terms(terms):
    # the reference's default '{e<=1}' suffix is `regex`-module fuzzy
    # syntax; the engine handles edit tolerance via the Levenshtein path,
    # so parity is on the alternation-group construction itself
    assert ref_processing.concat_or_terms(terms, suffix="") == \
        fuzzy.fuzzy_or_pattern(terms, expand_accents=False)


# ---------------------------------------------------------------------------
# basic_to_squad.py answer builders (module imports transformers, absent
# here; the three QA-construction functions are ast-extracted)
# ---------------------------------------------------------------------------

def _load_basic_to_squad():
    import ast
    import numpy.random as nr
    from typing import Dict as TDict, List as TList, Optional as TOpt

    path = os.path.join(
        REFERENCE_ROOT, "information_extraction_t5", "data",
        "basic_to_squad.py",
    )
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    wanted = {
        "get_question_answers", "get_compound_question_answers",
        "get_notapplicable_question_answers",
    }
    defs = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted]
    ns = {
        "Dict": TDict, "List": TList, "Optional": TOpt, "nr": nr,
        "TYPENAME_TO_TYPE": ref_type_map.TYPENAME_TO_TYPE,
        "get_questions_for_chunk": ref_preprocess.get_questions_for_chunk,
        "WARNING_MISSING_TYPENAMES": [],
    }
    exec(compile(ast.Module(body=defs, type_ignores=[]),  # noqa: S102
                 path, "exec"), ns)
    return ns


B2S = _load_basic_to_squad()


def test_na_answers_match_reference_builder():
    """registry.na_answer == the reference's forced-N/A answer text for
    every predicate (compound: one '[Type]: N/A' per subfield in
    signature order; basic_to_squad.py:133-193)."""
    for p in registry.DEFAULT_PREDICATES:
        qas = B2S["get_notapplicable_question_answers"](
            qa_id=p.qa_id, choose_question="first",
            list_of_use_compound_question=(
                [p.qa_id] if p.is_compound else []
            ),
        )
        assert len(qas) == 1
        assert qas[0]["answers"][0]["text"] == registry.na_answer(p)
        assert qas[0]["question"] == p.questions[0]
        assert qas[0]["id"] == p.qa_id


@SETTINGS
@given(
    st.sampled_from([p for p in registry.DEFAULT_PREDICATES
                     if not p.is_compound]),
    nonempty_fragment,
    st.sampled_from(["first", "all"]),
)
def test_simple_answer_text_matches_reference(pred, value, choose):
    doc = {pred.field: value}
    qas = B2S["get_question_answers"](
        doc, questions=list(pred.questions), qa_id=pred.qa_id,
        choose_question=choose,
    )
    expected_n = 1 if choose == "first" else len(pred.questions)
    assert len(qas) == expected_n
    display = registry.TYPENAME_TO_TYPE[pred.field]
    for qa in qas:
        assert qa["answers"][0]["text"] == f"[{display}]: {value}"
        assert qa["answers"][0]["answer_start"] == -1
    assert qas[0]["question"] == pred.questions[0]


@SETTINGS
@given(st.dictionaries(
    st.sampled_from(["logradouro", "numero", "complemento", "bairro",
                     "cidade", "estado", "cep"]),
    nonempty_fragment,
    min_size=0, max_size=7,
))
def test_compound_answer_assembly_matches_reference(filled):
    """The reference assembles a compound answer by filling the signature
    with '[Type]: N/A' then overwriting present subfields, joined in
    SIGNATURE order regardless of dict order (basic_to_squad.py:65-130)
    — exactly the geometry the local signature + type map reproduce."""
    endereco = next(p for p in registry.DEFAULT_PREDICATES
                    if p.qa_id == "form.endereco")
    doc = {"endereco": dict(filled)}
    qas = B2S["get_compound_question_answers"](
        doc, questions=list(endereco.questions), qa_id="form.endereco",
        choose_question="first",
    )
    expected = " ".join(
        f"[{registry.TYPENAME_TO_TYPE[sf]}]: {filled.get(sf, 'N/A')}"
        for sf in endereco.subfields
    )
    assert qas[0]["answers"][0]["text"] == expected


# ---------------------------------------------------------------------------
# highlights.py pure functions (module imports fuzzysearch, absent here;
# the alias maps, distance schedule and sentence lookups are ast-extracted)
# ---------------------------------------------------------------------------

def _load_highlights_pure():
    import ast
    from collections import OrderedDict
    from typing import Dict as TDict, Optional as TOpt, Tuple as TTup
    from typing import Union as TUni

    path = os.path.join(
        REFERENCE_ROOT, "information_extraction_t5", "features",
        "highlights.py",
    )
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    wanted_fns = {
        "include_variations", "get_levenshtein_dist",
        "find_sentence_of_sent_id", "find_indexes_of_sentence",
    }
    nodes = [
        n for n in tree.body
        if (isinstance(n, ast.FunctionDef) and n.name in wanted_fns)
        or (isinstance(n, ast.Assign)
            and isinstance(n.targets[0], ast.Name)
            and n.targets[0].id in ("estados", "area"))
    ]
    ns = {
        "OrderedDict": OrderedDict, "Dict": TDict, "Optional": TOpt,
        "Tuple": TTup, "Union": TUni, "T5_RAW_CONTEXT": str,
        "split_context_into_sentences": ref.split_context_into_sentences,
        "check_sent_id_is_valid": ref.check_sent_id_is_valid,
    }
    exec(compile(ast.Module(body=nodes, type_ignores=[]),  # noqa: S102
                 path, "exec"), ns)
    return ns


HIGHLIGHTS = _load_highlights_pure()


def test_alias_maps_identical():
    assert fuzzy.STATE_NAMES == HIGHLIGHTS["estados"]
    assert fuzzy.AREA_UNITS == HIGHLIGHTS["area"]


@SETTINGS
@given(st.one_of(
    st.sampled_from(sorted(fuzzy.STATE_NAMES) + sorted(fuzzy.AREA_UNITS)),
    st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ_a", min_size=0, max_size=6),
))
def test_include_variations(query):
    assert fuzzy.alias_variations(query) == \
        HIGHLIGHTS["include_variations"](query)


@SETTINGS
@given(st.text(alphabet=_FRAG_ALPHABET, min_size=0, max_size=40))
def test_levenshtein_dist_schedule(query):
    assert fuzzy.max_dist_for(query) == \
        HIGHLIGHTS["get_levenshtein_dist"](query)


@SETTINGS
@given(context_text, st.integers(min_value=0, max_value=8))
def test_sentence_of_sent_id(context, sid):
    ref_out = outcome(HIGHLIGHTS["find_sentence_of_sent_id"], context, sid)
    mine = outcome(lambda c, i: parsing.split_sentences(c)[i - 1],
                   context, sid)
    # reference raises IndexError past the end; sid-1 == -1 wraps to the
    # LAST sentence in both (the reference's sid=0 quirk, preserved)
    assert ref_out == mine


@SETTINGS
@given(context_text, st.integers(min_value=1, max_value=8))
def test_indexes_of_sentence(context, sid):
    ok_r, val_r = outcome(
        HIGHLIGHTS["find_indexes_of_sentence"], context, sid
    )
    if not ok_r:
        return  # out-of-range: covered above
    start, end = val_r
    # the reference locates the sentence by find() (first occurrence);
    # the invariant that matters downstream: the span slices a sentence
    # equal to the sid's sentence text
    sent = HIGHLIGHTS["find_sentence_of_sent_id"](context, sid)
    assert context[start:start + len(sent)] == sent
    assert end == context.find("\n", start)


# ---------------------------------------------------------------------------
# postprocess.py: group_qas and the compound explode
# ---------------------------------------------------------------------------

_ID_PIECES = st.sampled_from(
    ["form", "matriculas", "endereco", "agencia", "cpf", "estado", "x"]
)


@st.composite
def example_id(draw):
    base = ".".join(
        draw(st.lists(_ID_PIECES, min_size=1, max_size=3))
    )
    if draw(st.booleans()):
        base += "_" + draw(st.sampled_from(["0", "1", "12", "x", "3 "]))
    tail = draw(st.sampled_from(["", "*", "~estado", "~estado*", "~cidade"]))
    return base + tail


@SETTINGS
@given(st.lists(example_id(), min_size=1, max_size=10), st.booleans())
def test_group_qas(ids, group_by_typenames):
    expected = ref_postprocess.group_qas(ids, group_by_typenames)
    got: dict = {}
    for idx, ex_id in enumerate(ids):
        for key in compound.group_keys(ex_id, group_by_typenames):
            got.setdefault(key, []).append(idx)
    assert got == expected


@st.composite
def scored_row(draw):
    """(label, prediction, doc_id, ex_id, prob, window_ids) as the top-1 stage
    emits them: label/pred are compound answers, window id string has one id
    per prediction subanswer (postprocess.py:137-139)."""
    label, _ = draw(compound_answer())
    pred, _ = draw(compound_answer())
    n_pred_subs = len(ref.deconstruct_answer(pred)[0])
    wids = " ".join(
        str(draw(st.integers(min_value=0, max_value=5)))
        for _ in range(max(n_pred_subs, 1))
    )
    ex_id = draw(example_id())
    prob = draw(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
    return label, pred, "doc_1", ex_id, prob, wids


@SETTINGS
@given(st.lists(scored_row(), min_size=1, max_size=4), st.booleans(), st.booleans())
def test_split_compound_differential(rows, keep_original, keep_disjoint):
    labels = [r[0] for r in rows]
    preds = [r[1] for r in rows]
    doc_ids = [r[2] for r in rows]
    ex_ids = [r[3] for r in rows]
    probs = [r[4] for r in rows]
    wids = [r[5] for r in rows]

    (r_labels, r_preds, r_docs, r_exids, r_probs, r_wids, r_sids, r_raws,
     r_orig_idx, r_disjoint) = ref_postprocess.split_compound_labels_and_predictions(
        labels, preds, doc_ids, ex_ids, probs, wids,
        keep_original_compound=keep_original,
        keep_disjoint_compound=keep_disjoint,
    )

    mine = []
    for row in rows:
        mine.extend(
            compound.explode_row(
                *row,
                keep_original_compound=keep_original,
                keep_disjoint_compound=keep_disjoint,
            )
        )

    assert [m["label"] for m in mine] == r_labels
    assert [m["prediction"] for m in mine] == r_preds
    assert [m["document_id"] for m in mine] == r_docs
    assert [m["example_id"] for m in mine] == r_exids
    assert [m["prob"] for m in mine] == r_probs
    assert [m["window_ids"] for m in mine] == r_wids
    assert [m["sent_ids"] for m in mine] == r_sids
    assert [m["raw_text"] for m in mine] == r_raws
    assert [i for i, m in enumerate(mine) if m["is_original"]] == r_orig_idx
    got_disjoint: dict = {}
    for i, m in enumerate(mine):
        if m["disjoint_class"] is not None:
            got_disjoint.setdefault(m["disjoint_class"], []).append(i)
    assert got_disjoint == r_disjoint
