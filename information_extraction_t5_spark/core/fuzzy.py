"""Fuzzy span grounding: locate a canonical value's surface form in text.

Re-expresses the reference's fuzzysearch/fuzzywuzzy matching
(reference: features/highlights.py:96-232) with a self-contained
Sellers-style banded edit-distance scan (no external deps): the best
approximate occurrence of a query inside a sentence window, with a
length-scheduled maximum Levenshtein distance and canonical->surface alias
expansion (two-letter state codes, area units) — the seed of entity linking.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# Canonical -> surface-form variations (reference: highlights.py:13-47).
STATE_NAMES: Dict[str, str] = {
    "AC": "Acre", "AL": "Alagoas", "AP": "Amapá", "AM": "Amazonas",
    "BA": "Bahia", "CE": "Ceará", "DF": "Distrito Federal",
    "ES": "Espírito Santo", "GO": "Goiás", "MA": "Maranhão",
    "MT": "Mato Grosso", "MS": "Mato Grosso do Sul", "MG": "Minas Gerais",
    "PA": "Pará", "PB": "Paraíba", "PR": "Paraná", "PE": "Pernambuco",
    "PI": "Piauí", "RJ": "Rio de Janeiro", "RN": "Rio Grande do Norte",
    "RS": "Rio Grande do Sul", "RO": "Rondônia", "RR": "Roraima",
    "SC": "Santa Catarina", "SP": "São Paulo", "SE": "Sergipe",
    "TO": "Tocantins",
}

AREA_UNITS: Dict[str, List[str]] = {
    "metro_quadrado": ["m²", "m2", "metros quadrados"],
    "hectare": ["has", "hectares"],
    "alq_paulista": ["alqueires paulistas", "alqueires"],
}

# max edit distance by query length: <3 chars -> 0, <10 -> 1, <20 -> 3, else 5
DIST_SCHEDULE: List[Tuple[int, int]] = [(3, 0), (10, 1), (20, 3), (30, 5)]


# accented variants for fuzzy-regex construction (reference:
# utils/processing.py:48-59).  ANY member of a group expands to the whole
# bracketed group ('á' -> '[aáàâã]', 'ç' -> '[cç]'), lowercase only —
# byte-for-byte the reference behavior, pinned by the differential fuzz
# harness (tests/test_reference_differential.py).
_COMPOSITE_GROUPS = ["aáàâã", "eéê", "ií", "oóõ", "uúü", "cç"]
_COMPOSITE = {ch: f"[{group}]" for group in _COMPOSITE_GROUPS for ch in group}


def expand_composite_chars(pattern: str) -> str:
    """Replace every composable char with its accent-group character class
    (reference: processing.py:37-60)."""
    return "".join(_COMPOSITE.get(ch, ch) for ch in pattern)


def fuzzy_or_pattern(terms: List[str], max_edits: int = 1,
                     expand_accents: bool = True) -> str:
    """Alternation group over terms, accent-expanded — driver-side pattern
    builder feeding rlike (reference: processing.py:17-34; the `{e<=k}`
    fuzzy-regex syntax is library-specific there, so edit tolerance is
    handled by the Levenshtein path instead)."""
    body = "|".join(
        expand_composite_chars(t) if expand_accents else t for t in terms
    )
    return f"(?:{body})"


def alias_variations(canonical: str) -> List[str]:
    """Surface forms a canonical value may take in raw text
    (reference: highlights.py:50-58)."""
    if canonical in STATE_NAMES:
        return [STATE_NAMES[canonical]]
    if canonical in AREA_UNITS:
        return list(AREA_UNITS[canonical])
    return []


def max_dist_for(query: str) -> int:
    """Length-scheduled Levenshtein budget (reference: highlights.py:96-106)."""
    for size, dist in DIST_SCHEDULE:
        if len(query) < size:
            return dist
    return DIST_SCHEDULE[-1][1]


def best_substring_match(
    query: str, text: str, max_dist: int
) -> Optional[Tuple[int, int, int]]:
    """Best approximate occurrence of ``query`` inside ``text``.

    Banded Sellers DP: start position in ``text`` is free, edits are
    unit-cost.  Returns (start, end, dist) of the lowest-distance (then
    leftmost-ending) occurrence with dist <= max_dist, else None.
    """
    m, n = len(query), len(text)
    if m == 0:
        return None
    prev = list(range(m + 1))  # column for text prefix length 0
    # starts[i] = start offset in text of the alignment reaching query[:i]
    starts_prev = [0] * (m + 1)
    best: Optional[Tuple[int, int, int]] = None

    for j in range(1, n + 1):
        cur = [0] + [0] * m
        starts_cur = [j] + [0] * m
        tc = text[j - 1]
        for i in range(1, m + 1):
            sub = prev[i - 1] + (query[i - 1] != tc)
            ins = cur[i - 1] + 1   # consume query char
            dele = prev[i] + 1     # consume text char
            d = min(sub, ins, dele)
            cur[i] = d
            if d == sub:
                starts_cur[i] = starts_prev[i - 1]
            elif d == dele:
                starts_cur[i] = starts_prev[i]
            else:
                starts_cur[i] = starts_cur[i - 1]
        if cur[m] <= max_dist and (best is None or cur[m] < best[2]):
            best = (starts_cur[m], j, cur[m])
        prev, starts_prev = cur, starts_cur

    return best


def fuzzy_find(
    query: str,
    text: str,
    max_dist: Optional[int] = None,
) -> Tuple[Optional[int], Optional[int]]:
    """Best span of ``query`` (or one of its alias variations) in ``text``.

    Case-insensitive; variation queries get their own distance budget.
    Returns (start, end) char offsets or (None, None).
    Reference behavior: highlights.py:109-174.
    """
    hay = text.lower()
    best: Optional[Tuple[int, int, int]] = None
    for q in alias_variations(query) + [query]:
        ql = q.lower()
        budget = max_dist_for(ql) if max_dist is None else max_dist
        hit = best_substring_match(ql, hay, budget)
        if hit is not None and (best is None or hit[2] < best[2]):
            best = hit
    if best is None:
        return None, None
    return best[0], best[1]


def ground_answer(
    answer: str,
    sent_id: int,
    context: str,
    sentence_expansion: int = 0,
) -> Tuple[Optional[int], Optional[int], Optional[str]]:
    """Locate an answer inside the sentence its SENT id points to.

    Optionally widens the search window ``sentence_expansion`` sentences
    forward (answers can straddle linebreaks).  Returns (start, end,
    highlight) in *context* coordinates. Reference: highlights.py:177-232.
    """
    sentences = (context or "").split("\n")
    if sent_id < 1 or sent_id > len(sentences):
        return None, None, None
    pieces = [sentences[sent_id - 1]]
    for k in range(1, sentence_expansion + 1):
        if sent_id + k > len(sentences):
            break
        pieces.append(sentences[sent_id + k - 1])
    window = " ".join(pieces)

    shift = context.find(sentences[sent_id - 1])
    start, end = fuzzy_find(answer, window)
    if start is None or end is None:
        return None, None, None
    return start + shift, end + shift, context[start + shift : end + shift]
