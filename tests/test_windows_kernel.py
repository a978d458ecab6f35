"""Char-budget window assembly invariants (reference: context.py:26-173)."""
from information_extraction_t5_spark.core.windows import (
    WindowSpec,
    head_window,
    sliding_windows,
    window_at,
)


def _spec(**kw):
    base = dict(max_size=300, window_overlap=0.2, max_windows=-1,
                question="Qual?", use_sentence_id=False)
    base.update(kw)
    return WindowSpec(**base)


TEXT = "\n".join(f"linha numero {i} com algum conteudo util aqui" for i in range(30))


def test_head_window():
    out = head_window("x" * 500, 100, "Qual?")
    budget = 100 - len("question: Qual? context: ")
    assert out.endswith(" ...")
    assert len(out) == budget


def test_windows_cover_document():
    ws = sliding_windows(TEXT, _spec())
    assert ws[0].offset == 0
    last = ws[-1]
    assert last.offset + len(last.text) >= len(TEXT)
    assert [w.window_id for w in ws] == list(range(len(ws)))


def test_offset_alignment():
    # reference self-check (context.py:498-502): modulo the ellipses, the
    # window text must re-slice out of the document at its offset
    for w in sliding_windows(TEXT, _spec())[1:]:
        core = w.text[3:]  # after leading '...'
        if core.endswith("..."):
            core = core[:-3]
        sliced = TEXT[w.offset + 3 : w.offset + 3 + len(core)]
        assert sliced == core


def test_max_windows_cap():
    ws = sliding_windows(TEXT, _spec(max_windows=2))
    assert len(ws) == 2


def test_budget_respected_with_sentence_ids():
    spec = _spec(max_size=250, use_sentence_id=True)
    prefix = len(f"question: {spec.question} context: ")
    for w in sliding_windows(TEXT, spec):
        core = w.text.strip(".")
        n_sents = w.text.count("\n") + 1
        # window + projected [SENTn] tags must fit the budget
        assert len(core) + n_sents * len("[SENT1]") <= spec.max_size - prefix + 8


def test_single_window_short_text():
    ws = sliding_windows("curto", _spec())
    assert len(ws) == 1
    assert ws[0].text == "curto"
    assert ws[0].offset == 0


def test_empty_text():
    assert sliding_windows("", _spec()) == []


def test_window_at_snaps_to_space():
    # snap-to-space applies when the window starts before the anchor
    # (proportion_before > 0); reference: context.py:99-104
    text = "palavra " * 100
    w = window_at(text, 400, 120, "Qual?", False, proportion_before=0.3)
    assert w.text.startswith("...")
    # window start snapped forward to a space inside [start, anchor)
    assert text[w.offset + 3] == " "
