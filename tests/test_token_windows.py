"""Token-budget window kernel (reference windows_token mode) + property
tests over the text kernels (hypothesis)."""
from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_t5_spark.core import parsing, textnorm
from information_extraction_t5_spark.core.windows import (
    _token_index_at,
    default_token_spans,
    sliding_windows_token,
)

TEXT = "\n".join(
    f"linha numero {i} com algum conteudo util aqui mesmo" for i in range(40)
)


def test_spans_tile_text():
    spans = default_token_spans(TEXT)
    assert spans[0][0] == 0
    assert spans[-1][1] == len(TEXT)
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_token_windows_cover_and_respect_budget():
    ws = sliding_windows_token(TEXT, max_tokens=60, window_overlap=0.2,
                               max_windows=-1, question="Qual?")
    assert ws[-1].offset + len(ws[-1].text) >= len(TEXT)
    q_cost = len(default_token_spans("question: Qual? context: "))
    for w in ws:
        core = w.text.strip(".")
        assert len(default_token_spans(core)) <= 60 - q_cost + 2


def test_sentence_id_reserve_shrinks_windows():
    plain = sliding_windows_token(TEXT, 60, 0.2, -1, "Qual?", False)
    tagged = sliding_windows_token(TEXT, 60, 0.2, -1, "Qual?", True)
    assert len(tagged) >= len(plain)


def test_max_windows_and_degenerates():
    assert len(sliding_windows_token(TEXT, 60, 0.2, 2, "Qual?")) == 2
    assert sliding_windows_token("", 60) == []
    only = sliding_windows_token("curto", 60)
    assert len(only) == 1 and only[0].text == "curto"


def test_token_index_binary_search():
    spans = default_token_spans(TEXT)
    for pos in (0, 1, 17, len(TEXT) // 2, len(TEXT) - 1):
        idx = _token_index_at(spans, pos)
        assert spans[idx][0] <= pos < spans[idx][1]


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------

texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                           whitelist_characters="\n{}[]:ãéç"),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_spans_always_tile(t):
    spans = default_token_spans(t)
    if t:
        assert spans and spans[0][0] == 0 and spans[-1][1] == len(t)
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    else:
        assert spans == []


@settings(max_examples=200, deadline=None)
@given(texts)
def test_normalize_idempotent(t):
    once = textnorm.normalize_answer(t)
    assert textnorm.normalize_answer(once) == once


@settings(max_examples=200, deadline=None)
@given(texts)
def test_sent_numbering_counts(t):
    out = textnorm.number_sentences(t)
    assert out.count("[SENT") == t.count("\n") + 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["Logradouro", "Número", "Cidade", "Estado"]), min_size=1, max_size=5),
    st.integers(min_value=0, max_value=30))
def test_deconstruct_roundtrip_counts(names, sid):
    sentence = " ".join(
        f"[SENT{sid + i}] [{n}]: valor{i}" for i, n in enumerate(names)
    )
    subs, tns = parsing.deconstruct(sentence)
    assert len(subs) == len(names)
    assert len(tns) == len(names)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab \n", max_size=80),
       st.integers(min_value=-1, max_value=100))
def test_sent_id_bounds(ctx, pos):
    sid = textnorm.sent_id_at(ctx, pos)
    assert 0 <= sid <= ctx.count("\n") + 1
