"""DuckDB-SQL replications of the window-assembly kernels.

These generate the oracle side of the flagship hash gates (VERDICT r2
item 3): the same char/token budgeted sliding windows that
``core/windows.py`` computes in Python, re-derived in pure SQL over the
committed transcripts fixture.  The Python loop structure is unrolled —
one CTE per window (the kernel is sequential per document), and the
20-step budget shrink becomes a first-match scan over the 21 candidate
end positions (the loop only ever moves ``end`` when proportion_before
is 0, so the k-th step lands at a closed-form position).

Engine-parity notes (all pinned by tests/test_oracle_windows_sql.py):
  - positions are 0-based here and converted at the substr() callsites
    (SQL substr is 1-based);
  - Python ``str.find/rfind`` -> strpos arithmetic with explicit -1
    handling (rfind miss replicates the kernel's ``text[start:-1]``);
  - ``int(length * 0.8)`` -> cast(floor(l * 0.8) as int) — identical for
    the positive IEEE doubles both engines produce;
  - the reference cleanup chain's backreference collapse ``(\\s)\\1+``
    is RE2-inexpressible; ' +' -> ' ' is the equivalent on post-step-3
    text (step 3 already collapsed every newline run and stripped
    space-newline mixes).
"""
from __future__ import annotations

from typing import List

FIXTURE_TRANSCRIPTS = "/root/repo/tests/fixtures/transcripts_n40.parquet"


def _question_prefix(question: str) -> str:
    return f"question: {question} context: "


def docs_ctes(fixture: str = FIXTURE_TRANSCRIPTS) -> str:
    """transcripts -> cleaned documents: string_agg in turn order + the
    clean_document_text chain (functions/text.py:20-31)."""
    return f"""
        raw as (
          select conv_id,
                 string_agg(text, chr(10) order by turn_idx) as t0
          from '{fixture}' group by conv_id),
        docs as (
          select conv_id,
                 trim(
                   replace(replace(replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           replace(t0, '༡༨/༢', ''),
                           '\\t', ' ', 'g'),
                         '\\s*\\n+\\s*', chr(10), 'g'),
                       '  +', ' ', 'g'),
                     '´', chr(39)), '™', 'TM'),
                     '…', '...')
                 ) as text
          from raw),
        d0 as materialized (select conv_id, text, length(text) as tlen from docs)"""


def _nl(a: str, b: str) -> str:
    """Newline count in text[a:b] (0-based half-open), as SQL."""
    sub = f"substr(text, ({a}) + 1, ({b}) - ({a}))"
    return f"(length({sub}) - length(replace({sub}, chr(10), '')))"


def _char_window_cte(k: int, budget: int, tag_chars: int,
                     overlap: float, sentence_id: bool) -> str:
    """One unrolled iteration of core/windows.sliding_windows.

    Consumes w{k-1} (or d0), produces w{k} with columns
    (sp{k}, off{k}, len{k}, txt{k}, act{k}) layered onto the running row.
    """
    prev = "d0" if k == 0 else f"w{k-1}"
    if k == 0:
        sp = "0"
        act = "(tlen > 0)"
    else:
        sp = f"sp{k-1} + cast(floor(len{k-1} * {1 - overlap!r}) as int)"
        act = f"(act{k-1} and off{k-1} + len{k-1} < tlen)"
    tag = (
        f"(({_nl('s_', 'c_')} + 1) * {tag_chars})" if sentence_id else "0"
    )
    # candidate end positions after k=1..20 steps of overrun//20, then the
    # full-overrun fallback; first candidate meeting the budget wins
    # (list_filter preserves order; [1] is SQL-1-based head)
    return f"""
        w{k} as materialized (
          select *,
            {act} as act{k},
            {sp} as sp{k},
            least(tlen, sp{k} + {budget}) as e0_{k},
            (e0_{k} - sp{k}) + (({_nl(f'sp{k}', f'e0_{k}')} + 1)
                                * {tag_chars if sentence_id else 0})
              - {budget} as ov{k},
            case when ov{k} <= 0 then e0_{k}
                 else coalesce(
                   list_filter(
                     list_append(
                       list_transform(generate_series(1, 20),
                         st -> e0_{k} - st * (ov{k} // 20)),
                       e0_{k} - ov{k}),
                     c_ -> (c_ - sp{k})
                           + (case when {str(sentence_id).lower()}
                              then ({_nl(f'sp{k}', 'c_')} + 1) * {tag_chars}
                              else 0 end) <= {budget})[1],
                   e0_{k} - ov{k})
            end as fe{k},
            case when fe{k} < tlen then
              case when strpos(reverse(substr(text, sp{k} + 1,
                                              fe{k} - sp{k})), ' ') = 0
                   then tlen - 1
                   else sp{k} + (fe{k} - sp{k})
                        - strpos(reverse(substr(text, sp{k} + 1,
                                                fe{k} - sp{k})), ' ')
              end
            else fe{k} end as se{k},
            (case when sp{k} != 0 then '...' else '' end)
              || substr(text, sp{k} + 1, se{k} - sp{k})
              || (case when fe{k} < tlen then '...' else '' end) as txt{k},
            case when sp{k} != 0 then sp{k} - 3 else 0 end as off{k},
            length(txt{k}) as len{k}
          from {prev})"""


def char_windows_sql(
    fixture: str = FIXTURE_TRANSCRIPTS,
    max_size: int = 700,
    window_overlap: float = 0.2,
    max_windows: int = 6,
    question: str = "Qual o endereço?",
    use_sentence_id: bool = True,
) -> str:
    """Full oracle query for sliding_windows_exact over the fixture."""
    budget = max_size - len(_question_prefix(question))
    tag_chars = len("[SENT1]")
    ctes: List[str] = [docs_ctes(fixture)]
    selects: List[str] = []
    for k in range(max_windows):
        ctes.append(
            _char_window_cte(k, budget, tag_chars, window_overlap,
                             use_sentence_id)
        )
        selects.append(
            f"select conv_id, {k} as window_id, txt{k} as window_text,"
            f" off{k} as window_offset from w{max_windows - 1}"
            f" where act{k}"
        )
    return ("with " + ",".join(ctes) + "\n"
            + "\nunion all\n".join(selects))


# ---------------------------------------------------------------------------
# token-budget variant (core/windows.sliding_windows_token)
# ---------------------------------------------------------------------------

TOKEN_RE_SQL = r"\s*\S+|\s+$"


def _token_count(text: str) -> int:
    import re

    return len(re.findall(r"\s*\S+|\s+$", text))


def token_docs_ctes(fixture: str = FIXTURE_TRANSCRIPTS) -> str:
    """docs + token span ends: toks via regexp_extract_all (tiling the
    text), ends[i] = cumulative char length through token i (1-based
    list)."""
    return f"""{docs_ctes(fixture)},
        tk as materialized (
          select conv_id, text, tlen,
                 regexp_extract_all(text, '{TOKEN_RE_SQL}') as toks,
                 list_transform(
                   list_transform(toks, t_ -> length(t_)),
                   (x_, i_) -> cast(list_sum(
                     list_slice(list_transform(toks, t_ -> length(t_)),
                                1, i_)) as bigint)
                 ) as ends,
                 len(toks) as ntok
          from (select conv_id, text, length(text) as tlen from docs))"""


def _token_window_cte(k: int, budget: int, tag_tokens: int,
                      overlap: float, sentence_id: bool) -> str:
    """One unrolled iteration of sliding_windows_token (proportion_before
    = 0: only end_tok ever moves in the shrink loop, clamped at
    start_tok + 1)."""
    prev = "tk" if k == 0 else f"t{k-1}"
    if k == 0:
        sp = "0"
        act = "(ntok > 0 and tlen > 0)"
    else:
        sp = f"tsp{k-1} + cast(floor(tlen{k-1} * {1 - overlap!r}) as int)"
        act = f"(act{k-1} and toff{k-1} + tlen{k-1} < tlen"\
              f" and tlen{k-1} > 0)"
    # token index at char position: count of ends <= pos, clamped to n-1
    anchor = (
        f"least(len(list_filter(ends, e_ -> e_ <= tsp{k})), ntok - 1)"
    )
    tagc = tag_tokens if sentence_id else 0
    return f"""
        t{k} as materialized (
          select *,
            {act} as act{k},
            {sp} as tsp{k},
            {anchor} as atok{k},
            atok{k} as stok{k},
            least(atok{k} + {budget}, ntok) as et0_{k},
            case when stok{k} = 0 then 0 else ends[stok{k}] end as cs{k},
            ends[et0_{k}] as ce0_{k},
            (et0_{k} - stok{k})
              + (case when {str(sentence_id).lower()}
                 then ({_nl(f'cs{k}', f'ce0_{k}')} + 1) * {tagc}
                 else 0 end)
              - {budget} as tov{k},
            case when tov{k} <= 0 then et0_{k}
                 else coalesce(
                   list_filter(
                     list_append(
                       list_transform(generate_series(1, 20),
                         st -> greatest(et0_{k} - st * (tov{k} // 20),
                                        stok{k} + 1)),
                       greatest(et0_{k} - tov{k}, stok{k} + 1)),
                     c_ -> (c_ - stok{k})
                           + (case when {str(sentence_id).lower()}
                              then ({_nl(f'cs{k}', 'ends[c_]')} + 1) * {tagc}
                              else 0 end) <= {budget})[1],
                   greatest(et0_{k} - tov{k}, stok{k} + 1))
            end as etf{k},
            ends[etf{k}] as cef{k},
            -- start snap: find(' ', cs, tsp) when cs != 0
            case when cs{k} != 0 then
              case when tsp{k} > cs{k}
                        and strpos(substr(text, cs{k} + 1,
                                          tsp{k} - cs{k}), ' ') > 0
                   then greatest(cs{k}, cs{k} + strpos(
                          substr(text, cs{k} + 1, tsp{k} - cs{k}), ' ') - 1)
                   else cs{k} end
            else cs{k} end as csn{k},
            -- end snap: rfind(' ', tsp, cef) when cef < tlen
            case when cef{k} < tlen then
              case when cef{k} > tsp{k}
                        and strpos(reverse(substr(text, tsp{k} + 1,
                                                  cef{k} - tsp{k})), ' ') > 0
                   then tsp{k} + (cef{k} - tsp{k})
                        - strpos(reverse(substr(text, tsp{k} + 1,
                                                cef{k} - tsp{k})), ' ')
                   else tlen - 1 end
            else cef{k} end as cen{k},
            (case when csn{k} != 0 then '...' else '' end)
              || substr(text, csn{k} + 1, cen{k} - csn{k})
              || (case when cef{k} < tlen then '...' else '' end) as ttxt{k},
            case when csn{k} != 0 then csn{k} - 3 else 0 end as toff{k},
            length(ttxt{k}) as tlen{k}
          from {prev})"""


def token_windows_sql(
    fixture: str = FIXTURE_TRANSCRIPTS,
    max_tokens: int = 120,
    window_overlap: float = 0.2,
    max_windows: int = 6,
    question: str = "Qual o endereço?",
    use_sentence_id: bool = True,
) -> str:
    budget = max_tokens - _token_count(_question_prefix(question))
    tag_tokens = _token_count("[SENT10]")
    ctes: List[str] = [token_docs_ctes(fixture)]
    selects: List[str] = []
    for k in range(max_windows):
        ctes.append(
            _token_window_cte(k, budget, tag_tokens, window_overlap,
                              use_sentence_id)
        )
        selects.append(
            f"select conv_id, {k} as window_id, ttxt{k} as window_text,"
            f" toff{k} as window_offset from t{max_windows - 1}"
            f" where act{k}"
        )
    return ("with " + ",".join(ctes) + "\n"
            + "\nunion all\n".join(selects))
