"""Reference doctest parity for the answer-grammar kernels.

Golden cases ported from the reference docstrings (SURVEY.md §5 / F5):
sentences.py:40-45,61-66,94-100,135-144,182-195,235-241,264-270,286-292.
"""
import pytest

from information_extraction_t5_spark.core import parsing


COMPOUND = (
    "[SENT25] [Logradouro]: Rua PEDRO BIAGI [SENT26] [Número]: 462 "
    "[SENT25] [Cidade]: Sertãozinho [SENT0] [Estado]: SP"
)


def test_fragments_order_and_cleanup():
    assert parsing.fragments(COMPOUND) == [
        "Rua PEDRO BIAGI", "462", "Sertãozinho", "SP"
    ]


def test_sent_ids():
    assert parsing.sent_ids("[SENT1] Campinas") == [1]
    assert parsing.sent_ids(COMPOUND) == [25, 26, 25, 0]
    # non-numeric ids pass through
    assert parsing.sent_ids("[SENTx] foo") == ["x"]


def test_type_clues_mapping():
    assert parsing.type_clues("[Logradouro] Campinas") == ["logradouro"]
    with pytest.raises(ValueError, match="Unknown type name"):
        parsing.type_clues("[Tipo Desconhecido] x")
    assert parsing.type_clues("[Logradouro] x", map_to_typename=False) == [
        "Logradouro"
    ]


def test_split_components():
    sids, names, frags = parsing.split_components(COMPOUND)
    assert sids == [25, 26, 25, 0]
    assert names == ["logradouro", "numero", "cidade", "estado"]
    assert frags == ["Rua PEDRO BIAGI", "462", "Sertãozinho", "SP"]


def test_deconstruct_with_complement():
    sent = COMPOUND + " [aparece no texto] s paulo"
    subs, names = parsing.deconstruct(sent)
    assert subs == [
        "[SENT25] [logradouro]: Rua PEDRO BIAGI",
        "[SENT26] [numero]: 462",
        "[SENT25] [cidade]: Sertãozinho",
        "[SENT0] [estado]: SP [aparece no texto] s paulo",
    ]
    assert names == ["logradouro", "numero", "cidade", "estado"]


def test_subanswer_and_raw_text():
    sub = "[SENT1] [Logradouro] 88975 [aparece no texto] 88.975"
    assert parsing.subanswer_of(sub) == "[Logradouro]: 88975"
    assert parsing.raw_text_of(sub) == "88.975"
    assert parsing.raw_text_of("[SENT1] [Logradouro] 88975") is None
    assert parsing.clean_answers("[Logradouro]: 88975") == ["88975"]


def test_empty_answer():
    assert parsing.deconstruct("") == ([], [])
    assert parsing.subanswer_of("") == ""
    assert parsing.fragments("") == []


def test_sent_id_validity():
    ctx = "a\nb\nc"
    assert parsing.sent_id_is_valid(ctx, 0)
    assert parsing.sent_id_is_valid(ctx, 3)
    assert not parsing.sent_id_is_valid(ctx, 4)
    assert not parsing.sent_id_is_valid(ctx, -1)
    assert parsing.split_sentences(ctx) == ["a", "b", "c"]
