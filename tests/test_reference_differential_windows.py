"""Differential fuzzing of the char-mode window kernels against the
reference's own get_max_size_context / get_position_context /
get_windows_context (reference features/context.py:26-173).

context.py imports transformers at module top (absent here), but these
three functions depend only on ``math`` — so they are extracted from the
reference source with ``ast`` and exec'd in an isolated namespace, then run
side-by-side with core/windows.py on hypothesis-generated documents.
Window boundaries feed the per-turn text-equality invariant, so byte
parity here is load-bearing.
"""
from __future__ import annotations

import ast
import math
import os
from typing import Dict, List, Optional, Tuple, Union

import pytest
from hypothesis import given, settings, strategies as st

from information_extraction_t5_spark.core.windows import (
    WindowSpec,
    head_window,
    sliding_windows,
    window_at,
)

_CONTEXT_PY = os.path.join(
    os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference"),
    "information_extraction_t5", "features", "context.py",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(_CONTEXT_PY),
    reason="reference checkout not available",
)

SETTINGS = settings(max_examples=200, deadline=None)


def _load_reference_kernels():
    """exec just the three char-mode functions from the reference source."""
    with open(_CONTEXT_PY, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    wanted = {
        "get_max_size_context", "get_position_context", "get_windows_context"
    }
    defs = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {d.name for d in defs} == wanted
    module = ast.Module(body=defs, type_ignores=[])
    ns = {
        "math": math, "Dict": Dict, "List": List, "Tuple": Tuple,
        "Union": Union, "Optional": Optional,
    }
    exec(compile(module, _CONTEXT_PY, "exec"), ns)  # noqa: S102 — oracle load
    return ns


REF = _load_reference_kernels()

# Documents: words + newlines, long enough that windows/shrink paths fire.
doc_text = st.text(
    alphabet="abcdefghij ãç.\n", min_size=0, max_size=400
)
question = st.sampled_from([
    "Qual?", "Qual o endereço?",
    "Qual o tipo, a classe, o órgão emissor, a localização e a abrangência?",
])
# budget (max_size - len question prefix) stays >= ~25 so the reference's
# windows loop always advances (a zero-size window would loop it forever —
# an input the real pipeline never builds)
max_size = st.integers(min_value=120, max_value=300)


@SETTINGS
@given(doc_text, max_size, question)
def test_head_window_matches_reference(text, size, q):
    assert head_window(text, size, q) == REF["get_max_size_context"](
        {"text": text}, max_size=size, question=q
    )


@SETTINGS
@given(
    doc_text,
    max_size,
    question,
    st.integers(min_value=0, max_value=400),
    st.sampled_from([0.0, 0.2, 0.5]),
    st.booleans(),
)
def test_position_window_matches_reference(text, size, q, pos, prop, use_sid):
    pos = min(pos, len(text))
    ref_ctx, ref_off = REF["get_position_context"](
        {"text": text}, max_size=size, start_position=pos,
        proportion_before=prop, question=q, use_sentence_id=use_sid,
    )
    w = window_at(text, pos, size, q, use_sid, proportion_before=prop)
    assert (w.text, w.offset) == (ref_ctx, ref_off)


@SETTINGS
@given(
    doc_text,
    max_size,
    question,
    st.sampled_from([0.2, 0.5]),
    st.sampled_from([-1, 2, 3]),
    st.booleans(),
)
def test_sliding_windows_match_reference(text, size, q, overlap, max_w, use_sid):
    ref_ctxs, ref_offs = REF["get_windows_context"](
        {"text": text}, max_size=size, window_overlap=overlap,
        max_windows=max_w, question=q, use_sentence_id=use_sid,
    )
    spec = WindowSpec(max_size=size, window_overlap=overlap,
                      max_windows=max_w, question=q,
                      use_sentence_id=use_sid)
    ws = sliding_windows(text, spec)
    assert [w.text for w in ws] == ref_ctxs
    assert [w.offset for w in ws] == ref_offs
