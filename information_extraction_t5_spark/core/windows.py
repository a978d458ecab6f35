"""Sliding-window assembly over document text (char-budget kernel).

The per-document kernel that turns one long text blob into overlapping
context windows sized to a model budget.  Semantics match the reference's
char mode (reference: features/context.py:26-173) exactly — including the
iterative shrink that reserves budget for ``[SENTn]`` tags, the
snap-to-space at window edges and the ``...`` ellipses — because window
boundaries feed the per-turn/text-equality invariant.

This runs *per conversation* inside an Arrow-batched UDF; scale comes from
partitioning conversations across executors, not from vectorizing the
(inherently sequential) in-document scan.  Cost per conversation is bounded
by ``max_windows`` (skew bound; reference: context.py:171,339).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

_SENT_TAG_CHARS = len("[SENT1]")  # per-sentence budget reserve


@dataclass(frozen=True)
class WindowSpec:
    max_size: int = 4000          # char budget incl. question prefix
    window_overlap: float = 0.5   # fraction of window re-covered by the next
    max_windows: int = 3          # <=0 means unbounded (use with care: skew)
    question: str = "Qual?"       # budget is net of 'question: {q} context: '
    use_sentence_id: bool = False


@dataclass(frozen=True)
class Window:
    window_id: int
    text: str
    offset: int  # char offset of window text within the cleaned document


def _question_prefix_len(question: str) -> int:
    return len(f"question: {question} context: ")


def head_window(text: str, max_size: int, question: str) -> str:
    """First-N-chars window with a trailing ellipsis
    (reference: context.py:26-36)."""
    budget = max_size - _question_prefix_len(question)
    return text[: budget - 4] + " ..."


def window_at(
    text: str,
    start_position: int,
    max_size: int,
    question: str,
    use_sentence_id: bool,
    proportion_before: float = 0.0,
) -> Window:
    """One budgeted window anchored at ``start_position``.

    Shrinks in 20 fractional steps while the window plus its projected
    ``[SENTn]`` tag cost exceeds the budget, then snaps edges to spaces and
    adds ellipses. Reference: context.py:39-130.
    """
    budget = max_size - _question_prefix_len(question)

    start = max(0, start_position - math.floor(budget * proportion_before))
    end = min(len(text), budget + start)

    def tag_cost(a: int, b: int) -> int:
        if not use_sentence_id:
            return 0
        return (text[a:b].count("\n") + 1) * _SENT_TAG_CHARS

    size = end - start
    overrun = size + tag_cost(start, end) - budget
    if overrun > 0:
        steps = [overrun // 20] * 20 + [overrun % 20]
        for step in steps:
            if start == start_position:
                end -= step
            else:
                before = min(
                    math.floor(step * proportion_before), start_position - start
                )
                start += before
                end -= step - before
            if (end - start) + tag_cost(start, end) <= budget:
                break

    if start != 0:
        start = max(start, text.find(" ", start, start_position))
        offset = start - 3  # account for the leading '...'
        prefix = "..."
    else:
        offset = start
        prefix = ""
    if end < len(text):
        end = text.rfind(" ", start_position, end)
        suffix = "..."
    else:
        suffix = ""

    return Window(0, prefix + text[start:end] + suffix, offset)


import re as _re
from typing import Callable, Tuple

# Tokenizer protocol: text -> contiguous (start, end) char spans covering
# the whole text (the reference asserts len(text) == last token end;
# context.py:318-319).  Whitespace attaches to the following token, like
# sentencepiece's '▁' prefix.
TokenSpans = Callable[[str], List[Tuple[int, int]]]

_TOKEN_RE = _re.compile(r"\s*\S+|\s+$")


def default_token_spans(text: str) -> List[Tuple[int, int]]:
    """Deterministic regex tokenizer stand-in for sentencepiece (no model
    download): each token is a whitespace-prefixed word; spans tile the
    text exactly."""
    return [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def hf_token_spans(tokenizer) -> TokenSpans:
    """Adapter for a HuggingFace tokenizer with offset mapping — the
    production path (reference: context.py:8-15 derives offsets by cumsum;
    offset_mapping is the robust equivalent)."""

    def spans(text: str) -> List[Tuple[int, int]]:
        enc = tokenizer(text, return_offsets_mapping=True,
                        add_special_tokens=False)
        out = [(s, e) for s, e in enc["offset_mapping"] if e > s]
        # stretch spans to tile the text (attach gaps to the next token)
        tiled, prev = [], 0
        for s, e in out:
            tiled.append((prev, e))
            prev = e
        if tiled and tiled[-1][1] < len(text):
            tiled[-1] = (tiled[-1][0], len(text))
        return tiled

    return spans


def _token_index_at(spans: List[Tuple[int, int]], position: int) -> int:
    """Token whose span contains the char position (reference:
    context.py:18-23); binary search replaces the linear scan."""
    lo, hi = 0, len(spans) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if spans[mid][1] <= position:
            lo = mid + 1
        else:
            hi = mid
    return lo


def token_window_at(
    text: str,
    start_position: int,
    max_tokens: int,
    question: str,
    use_sentence_id: bool,
    spans: Optional[List[Tuple[int, int]]] = None,
    tokenizer: Optional[TokenSpans] = None,
    proportion_before: float = 0.0,
) -> Window:
    """Token-budgeted window around a char anchor — the reference's core
    assembly kernel (context.py:191-293): budget net of the question
    prefix, iterative 20-step shrink reserving projected [SENTn] tag
    tokens, snap-to-space, ellipses."""
    tok = tokenizer or default_token_spans
    if spans is None:
        spans = tok(text)
    if not spans:
        return Window(0, "", 0)

    budget = max_tokens - len(tok(f"question: {question} context: "))
    anchor_tok = _token_index_at(spans, start_position)
    start_tok = max(
        0, anchor_tok - math.floor(budget * proportion_before)
    )
    end_tok = min(
        anchor_tok + math.ceil(budget * (1 - proportion_before)), len(spans)
    )

    tag_tokens = len(tok("[SENT10]")) if use_sentence_id else 0

    def tag_cost(a: int, b: int) -> int:
        if not use_sentence_id:
            return 0
        return (text[a:b].count("\n") + 1) * tag_tokens

    start = spans[start_tok][0]
    end = spans[end_tok - 1][1]
    overrun = (end_tok - start_tok) + tag_cost(start, end) - budget
    if overrun > 0:
        steps = [overrun // 20] * 20 + [overrun % 20]
        for step in steps:
            if start == start_position:
                end_tok -= step
            else:
                before = min(
                    math.floor(step * proportion_before),
                    anchor_tok - start_tok,
                )
                start_tok += before
                end_tok -= step - before
            end_tok = max(end_tok, start_tok + 1)
            start = spans[start_tok][0]
            end = spans[end_tok - 1][1]
            if (end_tok - start_tok) + tag_cost(start, end) <= budget:
                break

    if start != 0:
        start = max(start, text.find(" ", start, start_position))
        offset = start - 3
        prefix = "..."
    else:
        offset = start
        prefix = ""
    if end < len(text):
        end = text.rfind(" ", start_position, end)
        suffix = "..."
    else:
        suffix = ""

    return Window(0, prefix + text[start:end] + suffix, offset)


def sliding_windows_token(
    text: str,
    max_tokens: int = 512,
    window_overlap: float = 0.5,
    max_windows: int = 3,
    question: str = "Qual?",
    use_sentence_id: bool = False,
    tokenizer: Optional[TokenSpans] = None,
) -> List[Window]:
    """Token-budgeted sliding windows (reference: context.py:296-341):
    advance by len(window)*(1-overlap) chars until the document is covered
    or max_windows is hit; spans are tokenized once per document."""
    tok = tokenizer or default_token_spans
    spans = tok(text)
    if spans:
        assert spans[-1][1] == len(text), (
            "token spans must tile the document "
            f"({spans[-1][1]} != {len(text)})"
        )
    out: List[Window] = []
    start_position = 0
    offset, length = 0, 0
    while offset + length < len(text):
        win = token_window_at(
            text, start_position, max_tokens, question, use_sentence_id,
            spans=spans, tokenizer=tok, proportion_before=0.0,
        )
        out.append(Window(len(out), win.text, win.offset))
        offset, length = win.offset, len(win.text)
        if length == 0:
            break
        start_position += int(length * (1 - window_overlap))
        if max_windows > 0 and len(out) == max_windows:
            break
    return out


def sliding_windows(text: str, spec: Optional[WindowSpec] = None) -> List[Window]:
    """Advance a window by ``len(window) * (1 - overlap)`` chars until the
    document is covered or ``max_windows`` is hit
    (reference: context.py:133-173)."""
    spec = spec or WindowSpec()
    out: List[Window] = []
    start_position = 0
    offset, length = 0, 0
    while offset + length < len(text):
        win = window_at(
            text,
            start_position,
            spec.max_size,
            spec.question,
            spec.use_sentence_id,
            proportion_before=0.0,
        )
        out.append(Window(len(out), win.text, win.offset))
        offset, length = win.offset, len(win.text)
        start_position += int(length * (1 - spec.window_overlap))
        if spec.max_windows > 0 and len(out) == spec.max_windows:
            break
    return out
