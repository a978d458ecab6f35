"""Fuzzy span grounding vs the reference doctest (highlights.py:198-204)."""
from information_extraction_t5_spark.core import fuzzy


def test_ground_answer_doctest():
    start, end, hl = fuzzy.ground_answer(
        "Rua Albert Einstein", 3, "Campinas\n\nRua 4lbert \nE1nstein 1000",
        sentence_expansion=2,
    )
    assert (start, end, hl) == (10, 30, "Rua 4lbert \nE1nstein")


def test_exact_match_distance_zero():
    s, e = fuzzy.fuzzy_find("BARREIRAS", "Município BARREIRAS\nUF BA")
    assert (s, e) == (10, 19)


def test_alias_variation_state():
    # canonical 'SP' must match the spelled-out form via variation expansion
    s, e = fuzzy.fuzzy_find("SP", "UF São Paulo")
    assert s is not None and "são paulo" in "uf são paulo"[s:e]


def test_area_units():
    assert fuzzy.alias_variations("hectare") == ["has", "hectares"]
    assert fuzzy.alias_variations("XX") == []


def test_dist_schedule():
    # reference: highlights.py:96-106 (<3 -> 0, <10 -> 1, <20 -> 3, else 5)
    assert fuzzy.max_dist_for("ab") == 0
    assert fuzzy.max_dist_for("abcdef") == 1
    assert fuzzy.max_dist_for("a" * 15) == 3
    assert fuzzy.max_dist_for("a" * 40) == 5


def test_no_match_returns_none():
    assert fuzzy.fuzzy_find("zzzzzzzz", "abc def") == (None, None)
    assert fuzzy.ground_answer("x", 9, "a\nb") == (None, None, None)


def test_best_substring_match_prefers_lower_distance():
    hit = fuzzy.best_substring_match("abcd", "xx abzd xx abcd xx", 2)
    assert hit is not None
    s, e, d = hit
    assert d == 0 and "xx abzd xx abcd xx"[s:e] == "abcd"
