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
