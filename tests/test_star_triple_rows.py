"""star_triple_rows (r7) must be row-for-row equal to the explode_row route
it replaced inside best_to_triples.

The reference implementation below is the pre-r7 best_to_triples inner
loop, verbatim; the property is checked over hand-written grammar edges and
a generated corpus of reference-grammar predictions.
"""
from __future__ import annotations

import math
import random

from information_extraction_t5_spark.core import compound, parsing


def _reference_rows(pred_sentence, ex, prob, wid):
    """Pre-r7 inner loop of best_to_triples (explode_row + star filter)."""
    out = []
    n_subs = len(parsing.deconstruct(pred_sentence or "")[0])
    wids = " ".join([str(wid)] * max(n_subs, 1))
    for row in compound.explode_row(
        pred_sentence or "", pred_sentence or "", "doc", ex,
        float(prob), wids,
    ):
        ex_id = row["example_id"]
        if not ex_id.endswith("*"):
            continue
        values = parsing.clean_answers(row["prediction"] or "")
        obj = values[0] if values else ""
        if not obj or obj == "N/A":
            continue
        sids = row["sent_ids"] or []
        w = row["window_ids"] or []
        out.append((
            ex_id[:-1], obj, row["raw_text"],
            int(w[0]) if w else -1, float(row["prob"]),
            int(sids[0]) if sids else -1,
        ))
    return out


def _normalize(rows):
    return [(b, o, r, w, p, int(s)) for b, o, r, w, p, s in rows]


def _assert_equal(pred, ex="form.endereco", prob=0.73, wid=3):
    got = _normalize(compound.star_triple_rows(pred, ex, prob, wid))
    want = _reference_rows(pred, ex, prob, wid)
    assert got == want, f"prediction={pred!r}\n got={got}\nwant={want}"


def test_grammar_edges():
    cases = [
        "[SENT3] [Etiqueta]: ID12345",
        "[Etiqueta]: N/A",
        "[SENT2] [CPF/CNPJ]: 123.456.789-01",
        "[SENT1] [No do Documento]: 123456 [aparece no texto] 123.456",
        # compound address incl. N/A sub-answers
        "[SENT1] [Logradouro]: RUA X [SENT2] [Número]: 12 "
        "[Complemento]: N/A [SENT4] [Bairro]: CENTRO [SENT5] [Cidade]: C "
        "[SENT6] [Estado]: SP [SENT7] [CEP]: 11111-222",
        # duplicate typenames (first-occurrence match semantics)
        "[SENT1] [Bairro]: A [SENT2] [Bairro]: B",
        # no typename at all / empty / bare fragment
        "",
        "N/A",
        "just some text",
        "[SENT5] just text after sent",
        # fragment-only continuation after a named sub
        "[SENT1] [Cidade]: A B C extra [SENT2] more",
        # complement binding on a compound member
        "[SENT1] [No do Documento]: 88975 [aparece no texto] 88.975 "
        "[SENT2] [Cidade]: X",
        # fast-path boundary probes (r7): values with colons, edge
        # whitespace, double separators — must fall through to the
        # general walk and still agree
        "[SENT2] [Nome]: A:B:C",
        "[SENT2] [Nome]:  leading space",
        "[SENT2] [Nome]: trailing space ",
        "[SENT1]  [Nome]: double sep",
        "[Nome]: N/A [aparece no texto] 1.2",
        "[aparece no texto]: X",
        "[Nome]: value [aparece no texto] ",
        "[Nome]: A  B",
        "[Nome]: XN/A",
        "[Nome]: N/A",
        "[CEP]: 11111-222",
    ]
    for pred in cases:
        _assert_equal(pred)
        _assert_equal(pred, ex="form.n_doc~x")  # '~' already in example id


def test_unknown_clue_raises_both_paths():
    import pytest

    for pred in ("[SENT3] [Nonexistent Clue]: X",  # fast-path shape
                 "[Nonexistent Clue]: X [SENT1] [Nome]: Y"):  # general
        with pytest.raises(ValueError, match="Unknown type name"):
            compound.star_triple_rows(pred, "e", 0.5, 1)
        with pytest.raises(ValueError, match="Unknown type name"):
            _reference_rows(pred, "e", 0.5, 1)


def test_generated_corpus():
    r = random.Random(42)
    names = ["Etiqueta", "Agência", "CPF/CNPJ", "Nome", "Logradouro",
             "Número", "Bairro", "Cidade", "Estado", "CEP",
             "No do Documento", "Complemento"]
    vals = ["N/A", "ID123", "RUA DAS FLORES", "12.345", "x", "", "A B",
            "A:B", " padded ", "a  b", "XN/A"]
    for _ in range(400):
        parts = []
        for _ in range(r.randint(1, 6)):
            if r.random() < 0.7:
                parts.append(f"[SENT{r.randint(0, 9)}]")
            parts.append(f"[{r.choice(names)}]: {r.choice(vals)}")
            if r.random() < 0.2:
                parts.append(f"[aparece no texto] {r.choice(vals)}")
        pred = " ".join(parts)
        prob = round(math.exp(-r.random()), 6)
        _assert_equal(pred, prob=prob, wid=r.randint(0, 5))
