"""Parsing of model-output sentences ("T5 sentences").

A model answer is a stringly-typed record such as::

    '[SENT25] [Tipo de Logradouro]: Rua [SENT26] [Número]: 462'

Three parallel component streams are encoded inline: sentence ids
(``[SENTn]``), type clues (``[Display Name]``) and answer fragments.  This
module re-implements the reference parsing semantics
(reference: information_extraction_t5/features/sentences.py:7-299) as pure
functions used by both the Arrow UDFs and the SQL-expression variants in
``functions/answers.py``.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

from information_extraction_t5_spark.core.registry import (
    COMPLEMENT_TYPE,
    TYPE_TO_TYPENAME,
)

# Same observable grammar as the reference (sentences.py:7-9); these three
# regexes ARE the wire format, so they must match character-for-character.
RE_SENT_ID = re.compile(r"\[SENT(.*?)\]")
RE_FRAGMENT = re.compile(r"([^[\]]+)(?:$|\[)")
RE_TYPE_CLUE = re.compile(
    r"\[([A-Za-záàâãéèêíïóôõöúçñÁÀÂÃÉÈÍÏÓÔÕÖÚÇÑºª_ \/]*?)\]"
)

SENT_TOKEN_TEMPLATE = " [SENT{}] "


def clean_fragment(fragment: str) -> str:
    """Strip ':' and surrounding whitespace from an answer fragment
    (reference: sentences.py:25-33)."""
    return fragment.replace(":", "").strip()


def fragments(sentence: str) -> List[str]:
    """All non-empty answer fragments, in order (reference: sentences.py:36-52)."""
    out = []
    for frag in RE_FRAGMENT.findall(sentence or ""):
        if frag.strip():
            out.append(clean_fragment(frag))
    return out


def sent_ids(sentence: str) -> List[int]:
    """SENT-token ids in order; non-numeric ids pass through as strings
    (reference: sentences.py:55-74)."""
    out: List = []
    for raw in RE_SENT_ID.findall(sentence or ""):
        try:
            out.append(int(raw))
        except ValueError:
            out.append(raw)
    return out


def type_clues(sentence: str, map_to_typename: bool = True) -> List[str]:
    """Bracketed type clues in order, optionally mapped to typenames
    (raises on unknown clue; reference: sentences.py:77-107)."""
    names = RE_TYPE_CLUE.findall(sentence or "")
    if not map_to_typename:
        return names
    mapped = []
    for name in names:
        if name not in TYPE_TO_TYPENAME:
            raise ValueError(f"Unknown type name: {name}")
        mapped.append(TYPE_TO_TYPENAME[name])
    return mapped


def split_components(
    sentence: str, map_to_typename: bool = True
) -> Tuple[List, List[str], List[str]]:
    """(sent_ids, typenames, fragments) of a model sentence
    (reference: sentences.py:120-153)."""
    return (
        sent_ids(sentence),
        type_clues(sentence, map_to_typename),
        fragments(sentence),
    )


def split_sentences(context: str) -> List[str]:
    """Context sentences are newline-delimited (reference: sentences.py:110-117)."""
    return (context or "").split("\n")


def sent_id_is_valid(context: str, sid: int) -> bool:
    """A SENT id is valid when 0 <= id <= number of sentences
    (reference: sentences.py:156-171)."""
    if sid < 0:
        return False
    return len(split_sentences(context)) >= sid


def deconstruct(sentence: str) -> Tuple[List[str], List[str]]:
    """Break a (possibly compound) answer into per-subanswer subsentences.

    Consumes the three component streams in lockstep; a complement clue
    (``[aparece no texto]``) binds to the preceding subanswer rather than
    opening a new one.  Returns (subsentences, typenames).
    Reference: sentences.py:174-227.

    >>> deconstruct('[SENT25] [Logradouro]: PEDRO BIAGI [SENT26] [Número]: 462')
    (['[SENT25] [logradouro]: PEDRO BIAGI', '[SENT26] [numero]: 462'], ['logradouro', 'numero'])
    """
    sids, names, frags = split_components(sentence)
    subs: List[str] = []
    emitted_names: List[str] = []

    while frags:
        parts: List[str] = []
        if sids:
            parts.append(f"[SENT{sids.pop(0)}]")
        if names:
            name = names.pop(0)
            parts.append(f"[{name}]:")
            emitted_names.append(name)
        parts.append(frags.pop(0))
        piece = " ".join(parts)
        if names and frags and names[0] == COMPLEMENT_TYPE:
            piece += f" [{names.pop(0)}] {frags.pop(0)}"
        subs.append(piece.strip())

    return subs, emitted_names


def subanswer_of(subsentence: str) -> str:
    """Subanswer without SENT token and raw-text complement, keeping the
    original display clue (reference: sentences.py:230-256)."""
    _, names, frags = split_components(subsentence, map_to_typename=False)
    if not frags:
        return ""
    if not names:
        return frags[0]
    return f"[{names[0]}]: {frags[0]}"


def raw_text_of(subsentence: str) -> Optional[str]:
    """Raw surface form after the complement clue, or None
    (reference: sentences.py:259-278)."""
    parts = (subsentence or "").split(f"[{COMPLEMENT_TYPE}]")
    if len(parts) < 2:
        return None
    return parts[1].strip()


def clean_answers(subanswer: str) -> List[str]:
    """Pure answer values with all bracket clues stripped
    (reference: sentences.py:281-299)."""
    try:
        return fragments(subanswer)
    except Exception:
        return [""]
