"""Text analysis for training-data pipelines — pure expressions.

Language ID (stopword-ratio heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and fingerprinting — all codegen-friendly,
no UDFs, so they run at scan speed over 100 TB corpora.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "of", "and", "to", "in", "is", "that", "it", "for",
                "on", "with", "as", "was", "at", "by"]
PT_STOPWORDS = ["de", "do", "da", "que", "e", "em", "um", "uma", "para",
                "com", "os", "as", "no", "na", "por"]
ES_STOPWORDS = ["el", "la", "los", "las", "que", "y", "en", "un", "una",
                "por", "con", "del", "se", "su", "para"]


def ws_tokens(col: Column) -> Column:
    t = F.split(F.trim(F.lower(col)), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored proxy: alnum runs and single punctuation marks each
    count as a token (regexp_extract_all, still JVM-side)."""
    pieces = F.regexp_extract_all(
        col, F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), 1
    )
    return F.size(pieces)


def stopword_ratio(col: Column, stopwords) -> Column:
    toks = ws_tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def language_id(col: Column) -> Column:
    """Argmax of per-language stopword ratios, 'und' when all zero."""
    en = stopword_ratio(col, EN_STOPWORDS)
    pt = stopword_ratio(col, PT_STOPWORDS)
    es = stopword_ratio(col, ES_STOPWORDS)
    best = F.greatest(en, pt, es)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(pt == best, F.lit("pt"))
        .otherwise(F.lit("es"))
    )


# Distinctive character trigrams per language (hand-picked from common
# function words; the n-gram profile method of Cavnar & Trenkle, reduced
# to a literal table so scoring is a pure expression).
LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", " of", "of ", "ing", "nd ", " an", "and",
           " to", "to ", " in", "ion", " is", "is "],
    "pt": [" de", "de ", " qu", "que", "ue ", " co", "ção", "ão ", " pa",
           "ara", " um", "um ", " na", "os ", "da "],
    "es": [" de", "de ", " la", "la ", " el", "el ", "os ", " en", "en ",
           "ión", " po", "por", " un", "una", "as "],
}


def char_trigrams(col: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    n = F.greatest(F.length(padded) - 2, F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(padded, i, 3)
    )


def trigram_score(col: Column, lang: str) -> Column:
    """Fraction of the text's trigrams found in the language profile."""
    tg = char_trigrams(col)
    hits = F.size(F.filter(tg, lambda t: t.isin(*LANG_TRIGRAMS[lang])))
    return F.when(F.size(tg) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(tg)
    )


def language_id_ngram(col: Column) -> Column:
    """Argmax over trigram-profile scores (n-gram heuristic LID), 'und'
    when nothing matches.  Tie order: en, pt, es — mirrors language_id."""
    en = trigram_score(col, "en")
    pt = trigram_score(col, "pt")
    es = trigram_score(col, "es")
    best = F.greatest(en, pt, es)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(pt == best, F.lit("pt"))
        .otherwise(F.lit("es"))
    )


def punct_ratio(col: Column) -> Column:
    total = F.length(col)
    punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[^\w\s]", "")
    )
    return F.when(total == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / total
    )


def mean_word_length(col: Column) -> Column:
    toks = ws_tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def quality_score(col: Column) -> Column:
    """[0,1] heuristic: length sweet-spot, low punctuation noise, plausible
    word lengths, some stopwords (fluency proxy)."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / 50.0, F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    mwl = mean_word_length(col)
    word_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    stop_score = F.least(
        (stopword_ratio(col, EN_STOPWORDS)
         + stopword_ratio(col, PT_STOPWORDS)) * 5.0,
        F.lit(1.0),
    )
    return F.round(
        0.3 * len_score + 0.3 * punct_score + 0.2 * word_score
        + 0.2 * stop_score,
        6,
    )


def content_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint over normalized content (md5 —
    portable across engines; swap for xxhash64 at scale)."""
    norm = F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
    return F.md5(norm)


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat block to a corpus."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        language_id(c).alias("lang_guess"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        content_fingerprint(c).alias("fingerprint"),
    )


def winnow_gram_hashes(col: Column, k: int = 5) -> Column:
    """array<bigint> of md5-derived k-gram hashes of the normalized text
    (the winnowing first pass).  md5 keeps it engine-portable
    (oracle-replayable); swap xxhash64 in hot paths."""
    norm = F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(norm, i, k)), 1, 8), 16, 10
        ).cast("bigint"),
    )


def winnow_select_minima(hashes: Column, w: int = 4) -> Column:
    """Sliding w-window minima -> sorted distinct fingerprint set.

    ``hashes`` MUST be a materialized column reference (an attribute),
    not an inline expression: Spark evaluates higher-order-function
    lambdas on the interpreted path with NO common-subexpression
    elimination across the lambda boundary, so an inline hash-array
    expression here is re-computed once per window position — O(n^2)
    md5 calls per document (found r6: a 300-char cap x 5000 docs took
    35+ min in one task; the two-projection form takes seconds).
    ``with_winnowing_fingerprints`` wires it correctly."""
    nw = F.greatest(F.size(hashes) - (w - 1), F.lit(1))
    sel = F.transform(
        F.sequence(F.lit(1), nw),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    return F.array_sort(F.array_distinct(sel))


def with_winnowing_fingerprints(df: DataFrame, text_col: str = "text",
                                k: int = 5, w: int = 4,
                                out_col: str = "fingerprints",
                                max_chars: int = 0) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS rolling-hash scheme): hash every char k-gram, slide a w-hash
    window, keep each window's minimum; the sorted-distinct selection is
    the fingerprint set.

    Guarantee: two documents sharing any substring of length >= w + k - 1
    share at least one fingerprint — the local sampling makes the
    fingerprint density ~2/(w+1) regardless of document length, so the
    per-document payload stays O(len/w) at 100 TB.

    Two separate projections by design: the gram-hash array materializes
    as a real column before the window-min pass (CollapseProject keeps
    non-cheap multiply-referenced aliases apart), which keeps the HOF
    lambda O(w) per position instead of re-evaluating the whole hash
    array — see winnow_select_minima.  ``max_chars`` > 0 caps the text
    first (fingerprint-probe pattern)."""
    c = F.col(text_col)
    if max_chars:
        c = F.substring(c, 1, max_chars)
    step = df.withColumn("__wf_hashes", winnow_gram_hashes(c, k))
    return (
        step.withColumn(
            out_col, winnow_select_minima(F.col("__wf_hashes"), w)
        )
        .drop("__wf_hashes")
    )


def winnowing_fingerprints(col: Column, k: int = 5, w: int = 4) -> Column:
    """Column-expression winnowing — ONLY for short/capped text.

    WARNING (r6): as a single expression the window-min lambda
    re-evaluates the whole gram-hash subtree per position (no CSE inside
    interpreted HOF lambdas) — O(n^2) md5 calls per document.  Use
    ``with_winnowing_fingerprints`` (two-projection form) anywhere the
    text isn't tightly capped; this form is kept for expression-context
    compatibility and small inputs."""
    hashes = winnow_gram_hashes(col, k)
    return winnow_select_minima(hashes, w)
