"""Text normalization + metrics kernels vs reference doctest goldens."""
from information_extraction_t5_spark.core import textnorm


def test_number_sentences_doctest():
    # reference: preprocess.py:48-53
    s = ("Rua PEDRO BIAGI 462 Apartamento nº 103, 1º Andar do RESIDENCIAL "
         "IMPERIAL. Sertãozinho\nSP")
    assert textnorm.number_sentences(s) == (
        " [SENT1] Rua PEDRO BIAGI 462 Apartamento nº 103, 1º Andar do "
        "RESIDENCIAL IMPERIAL. Sertãozinho [SENT2] SP"
    )


def test_number_sentences_brackets():
    assert textnorm.number_sentences("{x}\ny") == " [SENT1] (x) [SENT2] y"


def test_newlines_to_spaces_doctest():
    # reference: preprocess.py:73-78
    assert textnorm.newlines_to_spaces("a\nb") == "a b"


def test_sent_id_at():
    ctx = "line1\nline2\nline3"
    assert textnorm.sent_id_at(ctx, -1) == 0
    assert textnorm.sent_id_at(ctx, 0) == 1
    assert textnorm.sent_id_at(ctx, 6) == 2
    assert textnorm.sent_id_at(ctx, 13) == 3


def test_clean_document_text():
    raw = "  a\tb \n\n  c  d´e™f…g ༡༨/༢ "
    out = textnorm.clean_document_text(raw)
    assert "\t" not in out
    assert "\n\n" not in out
    assert "´" not in out and "TM" in out and "..." in out
    assert "༡" not in out
    assert out == out.strip()


def test_t5_input():
    assert textnorm.t5_input("a\nb", "Q?", False) == "question: Q? context: a b"
    assert textnorm.t5_input("a\nb", "Q?", True) == (
        "question: Q? context:  [SENT1] a [SENT2] b"
    )


def test_t5_label_simple_and_compound():
    ctx = "x\ny\nz"
    assert textnorm.t5_label("[Estado]: SP", 2, ctx, True) == (
        "[SENT2] [Estado]: SP"
    )
    assert textnorm.t5_label("[Estado]: SP", -1, ctx, True) == (
        "[SENT0] [Estado]: SP"
    )
    assert textnorm.t5_label("[Estado]: SP", 2, ctx, False) == "[Estado]: SP"
    compound = "[Cidade]: C [Estado]: E"
    out = textnorm.t5_label(compound, [0, 4], ctx, True)
    assert out == "[SENT1] [Cidade]: C [SENT3] [Estado]: E"


def test_normalize_answer():
    assert textnorm.normalize_answer("São Paulo") == "sao paulo"
    assert textnorm.normalize_answer("The  QUICK, fox!") == "quick fox"
    assert textnorm.normalize_answer("") == ""


def test_exact_and_f1():
    assert textnorm.exact_match("São Paulo", "sao paulo!") == 1
    assert textnorm.exact_match("x", "y") == 0
    assert abs(textnorm.token_f1("x y z", "x y w") - 2 / 3) < 1e-12
    # duplicate tokens counted as multiset (reference metrics.py:50-63)
    assert abs(textnorm.token_f1("x x y", "x x x") - 4 / 6) < 1e-12
    assert textnorm.token_f1("", "") == 1.0
    assert textnorm.token_f1("x", "") == 0.0
