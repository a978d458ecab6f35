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

import os

from typing import List

# __file__-relative so the oracles resolve the SAME files as the parity
# tests wherever the repo is checked out (ADVICE r3)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIXTURE_DIR = os.path.join(_REPO_ROOT, "tests", "fixtures")
FIXTURE_TRANSCRIPTS = os.path.join(_FIXTURE_DIR, "transcripts_n40.parquet")


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
                 regexp_replace(
                   replace(replace(replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           replace(t0, '༡༨/༢', ''),
                           '\\t', ' ', 'g'),
                         '\\s*\\n+\\s*', chr(10), 'g'),
                       '  +', ' ', 'g'),
                     '´', chr(39)), '™', 'TM'),
                     '…', '...'),
                   '^\\s+|\\s+$', '', 'g'
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


# ---------------------------------------------------------------------------
# kg_triples: full-document extraction + alias linking + canonicalization
# ---------------------------------------------------------------------------

# (field, predicate, RE2 pattern) — the same grammar the
# RegexFormExtractor matches per-window (operators/extraction.py:112-210);
# over the FULL document the first match is the planted value, and the
# pipeline's windowed top-1 recovers the identical set (P=R=1.0 on this
# corpus; pinned empirically by tests/test_oracle_triples_sql.py).
_SIMPLE_FIELDS = [
    ("etiqueta", "form.etiqueta", r"(?m)^(ID[0-9]{5})$"),
    ("agencia", "form.agencia", "(?m)^Agência Nº\\n([0-9]{4})$"),
    ("conta_corrente", "form.conta_corrente",
     r"Conta Corrente (\S+)"),
    ("cpf", "form.cpf",
     r"(?m)^([0-9]{3}\.[0-9]{3}\.[0-9]{3}-[0-9]{2})$"),
    ("nome_completo", "form.nome_completo", r"(?m)Nome Completo (.+)$"),
    ("orgao_emissor", "form.orgao_emissor", r"Órgão Emissor (\S+)"),
    ("data_emissao", "form.data_emissao",
     r"Data de Emissão ([0-9]{2}/[0-9]{2}/[0-9]{4})"),
    ("data_nascimento", "form.data_nascimento",
     r"Data de Nascimento ([0-9]{2}/[0-9]{2}/[0-9]{4})"),
    ("nome_mae", "form.nome_mae", r"(?m)Nome da Mãe (.+)$"),
    ("nome_pai", "form.nome_pai", r"(?m)Nome do Pai (.+)$"),
    ("logradouro", "form.endereco.logradouro",
     r"(?m)Rua/Av/Pça/Estrada (.+)$"),
    ("numero", "form.endereco.numero",
     "(?m)^Número\\n([0-9]+)( Complemento.*)?$"),
    ("complemento", "form.endereco.complemento",
     r"(?m)Complemento (.+)$"),
    ("bairro", "form.endereco.bairro", r"(?m)^Bairro (.+)$"),
    ("cidade", "form.endereco.cidade", r"(?m)Município (.+)$"),
    ("estado", "form.endereco.estado", r"(?m)^UF (.+?)( País.*)?$"),
    ("cep", "form.endereco.cep", r"(?m)^([0-9]{5}-[0-9]{3})$"),
]
_NDOC_PATTERN = r"(?m)^([0-9.]+) Órgão Emissor"


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def normalize_answer_sql(col: str) -> str:
    """functions/text.normalize_answer as a DuckDB expression: lower,
    strip punctuation, fold accents, drop english articles, collapse
    whitespace."""
    from information_extraction_t5_spark.functions.text import (
        ACCENTED,
        FOLDED,
        PUNCT,
    )

    c = f"lower({col})"
    c = f"translate({c}, '{_sql_quote(PUNCT)}', '')"
    c = f"translate({c}, '{_sql_quote(ACCENTED)}', '{_sql_quote(FOLDED)}')"
    c = f"regexp_replace({c}, '\\b(a|an|the)\\b', ' ', 'g')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def _alias_values_sql() -> str:
    """The alias dictionary (linking.alias_rows) as inline VALUES."""
    from information_extraction_t5_spark.operators.linking import alias_rows

    rows = ", ".join(
        f"('{_sql_quote(r['alias'])}', '{_sql_quote(r['canonical'])}')"
        for r in alias_rows()
    )
    return f"(values {rows}) a(alias, canonical)"


def _minhash16_sql(shingle_col: str) -> str:
    return ",\n                 ".join(
        f"list_aggregate(list_transform({shingle_col}, "
        f"x_ -> md5('{i}:' || x_)), 'min')"
        for i in range(16)
    )


def kg_triples_sql(fixture: str = FIXTURE_TRANSCRIPTS,
                   link_pred: str = "form.endereco.estado",
                   fuzzy_max_dist: int = 2) -> str:
    """(conv_id, pred, obj, obj_raw, subj) — the pipeline's triple set
    re-derived: regex extraction over the assembled document, alias
    linking of the estado predicate, exact mention-key + LSH-blocked
    fuzzy-name connected components for the canonical subject."""
    field_selects = []
    for field, pred, pat in _SIMPLE_FIELDS:
        field_selects.append(
            f"select conv_id, '{pred}' as pred,\n"
            f"       nullif(regexp_extract(text, '{_sql_quote(pat)}', 1),"
            f" '') as obj,\n"
            f"       cast(null as varchar) as obj_raw from docs"
        )
    # n_doc_serie: canonical strips thousands dots; raw kept when dotted
    field_selects.append(
        "select conv_id, 'form.n_doc_serie' as pred,\n"
        f"       replace(nullif(regexp_extract(text,"
        f" '{_sql_quote(_NDOC_PATTERN)}', 1), ''), '.', '') as obj,\n"
        f"       case when regexp_extract(text,"
        f" '{_sql_quote(_NDOC_PATTERN)}', 1) like '%.%'\n"
        f"            then regexp_extract(text,"
        f" '{_sql_quote(_NDOC_PATTERN)}', 1)\n"
        f"            else null end as obj_raw from docs"
    )
    union_fields = "\nunion all\n".join(field_selects)
    norm_obj = normalize_answer_sql("obj")

    return f"""
        with recursive {docs_ctes(fixture)},
        rawtrip as materialized (
          select * from ({union_fields}) where obj is not null),
        trip as materialized (
          select t.conv_id, t.pred,
                 case when t.pred = '{link_pred}'
                      then coalesce(a.canonical, t.obj) else t.obj end
                   as obj,
                 t.obj_raw
          from rawtrip t
          left join {_alias_values_sql()}
            on t.pred = '{link_pred}' and lower(t.obj) = a.alias),
        -- canonicalization: exact mention keys (cpf + normalized name)
        mk as materialized (
          select distinct conv_id as mention,
                 pred || '=' || {norm_obj} as key
          from trip where pred in ('form.cpf', 'form.nome_completo')),
        krep as (select key, min(mention) as rep from mk group by key),
        kedges as (
          select mention as src, rep as dst from mk
          join krep using (key) where mention != rep),
        -- fuzzy-name edges: md5 minhash (16 hashes, 4 bands of 4,
        -- 3-char shingles, bucket cap 64) + levenshtein <= {fuzzy_max_dist}
        names as materialized (
          select {norm_obj} as name, min(conv_id) as id
          from trip where pred = 'form.nome_completo' group by 1),
        nsh as (
          select id, name,
                 list_transform(
                   generate_series(1, greatest(length(lower(name)) - 2, 1)),
                   i_ -> substring(lower(name), i_, 3)) as s
          from names),
        nsig as materialized (
          select id, name, [
                 {_minhash16_sql('s')}
               ] as g
          from nsh),
        nbands as materialized (
          select id, b.band,
                 array_to_string(
                   list_slice(g, b.band * 4 + 1, b.band * 4 + 4), '|')
                   as band_key
          from nsig, lateral unnest(generate_series(0, 3)) as b(band)),
        nbsz as (
          select band, band_key, count(*) as n_
          from nbands group by 1, 2),
        nb2 as (
          select nb.* from nbands nb
          join nbsz z using (band, band_key) where z.n_ <= 64),
        ncand as (
          select distinct l.id as id_a, r.id as id_b
          from nb2 l join nb2 r
            on l.band = r.band and l.band_key = r.band_key
           and l.id < r.id),
        fpairs as (
          select c.id_a as src, c.id_b as dst from ncand c
          join names a on a.id = c.id_a
          join names b on b.id = c.id_b
          where abs(length(a.name) - length(b.name)) <= {fuzzy_max_dist}
            and levenshtein(a.name, b.name) <= {fuzzy_max_dist}),
        alledges as (
          select src, dst from kedges union select src, dst from fpairs),
        sym as materialized (
          select src as a, dst as b from alledges
          union select dst, src from alledges),
        reach(a, b) as (
          select a, b from sym
          union
          select r.a, s.b from reach r join sym s on s.a = r.b),
        comp as (
          select a as node, least(a, min(b)) as comp
          from reach group by a)
        select t.conv_id, t.pred, t.obj, t.obj_raw,
               'ent:' || coalesce(c.comp, t.conv_id) as subj
        from trip t left join comp c on c.node = t.conv_id
    """


FIXTURE_GOLDENS = os.path.join(_FIXTURE_DIR, "golden_triples_n40.parquet")


def kg_eval_rollup_sql(fixture: str = FIXTURE_TRANSCRIPTS,
                       goldens: str = FIXTURE_GOLDENS,
                       link_pred: str = "form.endereco.estado") -> str:
    """Eval rollup over the pipeline's (deterministically corrupted)
    predictions vs the golden triples: extraction+linking re-derived in
    SQL, exact + set-semantic token F1, metric group keys, grouping-sets
    rollup with integer-exact aggregates."""
    # extraction + linking CTE chain shared with kg_triples_sql (the
    # canonicalization stages are irrelevant here)
    base = kg_triples_sql(fixture, link_pred)
    head, _, _ = base.partition("-- canonicalization")
    norm = normalize_answer_sql
    toks = (
        lambda col: f"case when {norm(col)} = '' then []::varchar[] "
        f"else string_split({norm(col)}, ' ') end"
    )
    f1row = """case
          when len(gt) = 0 and len(pt) = 0 then 1.0
          when len(gt) = 0 or len(pt) = 0 then 0.0
          when len(list_intersect(gt, pt)) = 0 then 0.0
          else 2 * (cast(len(list_intersect(gt, pt)) as double) / len(pt))
                 * (cast(len(list_intersect(gt, pt)) as double) / len(gt))
               / ((cast(len(list_intersect(gt, pt)) as double) / len(pt))
                  + (cast(len(list_intersect(gt, pt)) as double) / len(gt)))
        end"""
    return f"""{head.rstrip().rstrip(',')},
        idx as (
          select conv_id, pred, obj,
                 cast(string_split(conv_id, '_')[2] as int) as i_
          from trip),
        predicted as (
          -- deterministic corruption so exact/f1 are non-vacuous: every
          -- idx%5==2 conv's objects get ' X' appended; idx%7==3 convs
          -- lose their nome_pai prediction entirely
          select conv_id, pred,
                 case when i_ % 5 = 2 then obj || ' X' else obj end as obj
          from idx
          where not (i_ % 7 = 3 and pred = 'form.nome_pai')),
        golden as (
          select conv_id, pred, obj as gold_obj from '{goldens}'),
        paired as (
          select coalesce(p.conv_id, g.conv_id) as document_id,
                 coalesce(p.pred, g.pred) as example_id,
                 coalesce(p.obj, '') as prediction,
                 coalesce(g.gold_obj, '') as label
          from predicted p
          full join golden g
            on p.conv_id = g.conv_id and p.pred = g.pred),
        keyed as (
          -- group_keys for plain dotted ids with non-numeric '_' tails:
          -- [class prefix, full id] (postprocess.group_keys_expr)
          select document_id, prediction, label, k.group_key
          from paired,
          lateral unnest([string_split(example_id, '.')[1], example_id])
            as k(group_key)),
        scored as (
          select group_key,
                 case when {norm('label')} = {norm('prediction')}
                      then 1 else 0 end as exact,
                 round({f1row}, 6) as f1r
          from (select *, {toks('label')} as gt, {toks('prediction')} as pt
                from keyed))
        select group_key,
               cast(sum(exact) as bigint) as exact_hits,
               cast(round(sum(f1r) * 1000000) as bigint) as f1_micro,
               cast(count(*) as bigint) as total
        from scored group by rollup(group_key)
    """
