"""Corpus-quality operators for LLM training-data curation: Gopher-style
repetition signals, PII detection/redaction, and URL normalization.

All three families are PURE EXPRESSIONS — per-row higher-order functions
and regexes that run inside whole-stage codegen with no shuffle, no
Python, and no state.  At 100 TB they execute at scan speed: the plan is
a single map over the parquet scan, filters on the emitted fractions
push down to the same stage, and the only cost is CPU per row.  The
per-row loops (distinct-gram counting) are O(|distinct| * |items|) in
the document's own arrays, which is bounded by document length — never
by corpus size.

Extends ``operators/textstats.py`` (length/stopword/language/quality
heuristics) with the duplicate-content axis of quality filtering
(Gopher / Rae et al. 2021, table A1; same signals used by C4/Dolma
cleaning): documents dominated by repeated lines or n-grams are
low-quality boilerplate even when their token statistics look fine.

Definitions are pinned exactly so the DuckDB oracle can replay them
(the driver gates ``repetition_stats``, ``pii_redaction`` and
``url_domains`` in ``__spark_entry__``):

- ``dup_line_frac``      — duplicated line OCCURRENCES (beyond each
                           first) / total lines.
- ``dup_line_char_frac`` — characters in those duplicated occurrences /
                           characters in all lines.
- ``top_2gram_char_frac``— max over distinct word 2-grams of
                           occurrences * gram_length, / text length
                           (gram length includes its internal space).
                           Upper bound of Gopher's "chars in the most
                           frequent 2-gram" — ties need no tiebreak.
- ``dup_5gram_char_frac``— sum over word 5-grams occurring >= 2 times of
                           occurrences * gram_length, / text length,
                           capped at 1.0 (overlaps can exceed it).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def _words(col: Column) -> Column:
    return F.when(
        F.length(F.trim(col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(col), r"\s+"))


def word_ngrams(col: Column, n: int) -> Column:
    """Space-joined word n-grams; empty array when there are < n words."""
    words = _words(col)
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_line_stats(col: Column) -> tuple[Column, Column, Column]:
    """(n_lines, dup_line_frac, dup_line_char_frac) as pure expressions."""
    lines = F.split(col, "\n")
    n = F.size(lines)
    distinct = F.array_distinct(lines)
    dup_frac = (n - F.size(distinct)).cast("double") / n
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    extra_chars = F.aggregate(
        distinct,
        F.lit(0),
        lambda acc, dl: acc
        + (F.size(F.filter(lines, lambda x: x == dl)) - 1) * F.length(dl),
    )
    dup_char_frac = F.when(line_chars == 0, F.lit(0.0)).otherwise(
        extra_chars.cast("double") / line_chars
    )
    return n, dup_frac, dup_char_frac


def top_ngram_char_frac(col: Column, n: int) -> Column:
    """max over distinct n-grams of count*length, / text length."""
    grams = word_ngrams(col, n)
    dg = F.array_distinct(grams)
    best = F.array_max(
        F.transform(
            dg,
            lambda g: F.size(F.filter(grams, lambda x: x == g))
            * F.length(g),
        )
    )
    return F.when(
        (F.size(dg) == 0) | (F.length(col) == 0), F.lit(0.0)
    ).otherwise(best.cast("double") / F.length(col))


def dup_ngram_char_frac(col: Column, n: int) -> Column:
    """sum over n-grams with count>=2 of count*length, / text length,
    capped at 1.0."""
    grams = word_ngrams(col, n)
    dg = F.array_distinct(grams)
    dup_chars = F.aggregate(
        dg,
        F.lit(0),
        lambda acc, g: acc
        + F.when(
            F.size(F.filter(grams, lambda x: x == g)) >= 2,
            F.size(F.filter(grams, lambda x: x == g)) * F.length(g),
        ).otherwise(F.lit(0)),
    )
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), dup_chars.cast("double") / F.length(col))
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile — one narrow map, no shuffle."""
    col = F.col(text_col)
    n_lines, dup_line_frac, dup_line_char_frac = dup_line_stats(col)
    return df.select(
        id_col,
        n_lines.cast("bigint").alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac, 6).alias("dup_line_char_frac"),
        F.round(top_ngram_char_frac(col, 2), 6).alias("top_2gram_char_frac"),
        F.round(dup_ngram_char_frac(col, 5), 6).alias("dup_5gram_char_frac"),
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    max_dup_line_char_frac: float = 0.20,
    max_dup_5gram_char_frac: float = 0.15,
) -> DataFrame:
    """Gopher-style composite quality filter (Rae et al. 2021, table A1
    subset): per-rule booleans plus the conjunction ``keep``.

    One narrow map — every rule is a pure expression over this module's
    repetition signals and simple word stats, so the filter runs at scan
    speed and ``filter(keep)`` pushes into the same stage.  Rule
    comparisons divide integers (counts, char totals), so the doubles are
    IEEE-identical across engines and the booleans replay exactly in the
    DuckDB oracle (the repo's integer-exact convention).
    """
    col = F.col(text_col)
    words = _words(col)
    n_words = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mwl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        word_chars.cast("double") / n_words
    )
    _, _, dup_line_cf = dup_line_stats(col)
    dup5_cf = dup_ngram_char_frac(col, 5)
    words_ok = (n_words >= min_words) & (n_words <= max_words)
    mwl_ok = (mwl >= min_mwl) & (mwl <= max_mwl)
    dup_line_ok = dup_line_cf <= max_dup_line_char_frac
    dup_5gram_ok = dup5_cf <= max_dup_5gram_char_frac
    return df.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        words_ok.alias("words_ok"),
        mwl_ok.alias("mwl_ok"),
        dup_line_ok.alias("dup_line_ok"),
        dup_5gram_ok.alias("dup_5gram_ok"),
        (words_ok & mwl_ok & dup_line_ok & dup_5gram_ok).alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround; \b is ASCII-safe
# on the ASCII-delimited matches below.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d()\- ]{6,}\d"

_REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Sequential redaction: emails, then IPv4s, then phone-like digit
    runs (order matters — an un-redacted IP is digit-rich).  Counts are
    computed on the ORIGINAL text by ``pii_stats``; the patterns cannot
    overlap each other's matches (dots break the phone class, '@' breaks
    both number classes)."""
    out = col
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, email_count, ipv4_count, phone_like_count, redacted).

    ``phone_like_count`` is deliberately permissive (8+ chars of digits,
    spaces, parens, dashes) — curation pipelines over-redact numbers
    rather than leak them; precision comes from the email/IP passes
    running first."""
    col = F.col(text_col)
    return df.select(
        id_col,
        F.regexp_count(col, F.lit(EMAIL_RE)).alias("email_count"),
        F.regexp_count(col, F.lit(IPV4_RE)).alias("ipv4_count"),
        F.regexp_count(col, F.lit(PHONE_RE)).alias("phone_like_count"),
        redact_pii(col).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

URL_RE = r"(?i)https?://\S+"
_HEAD_RE = r"(?i)^(https?://[^/]*)"


def normalize_url(u: Column) -> Column:
    """Lowercase scheme+authority, strip #fragment, default :80/:443
    ports, and a trailing slash.  Path case is preserved (paths are
    case-sensitive; hosts are not)."""
    u = F.regexp_replace(u, "#.*", "")
    head = F.regexp_extract(u, _HEAD_RE, 1)
    rest = F.substring(u, F.length(head) + 1, F.length(u))
    head = F.regexp_replace(F.lower(head), ":(80|443)$", "")
    return F.regexp_replace(F.concat(head, rest), "/$", "")


def url_domain(u: Column) -> Column:
    return F.regexp_extract(u, r"^https?://([^/:]+)", 1)


def extract_urls(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(URL_RE), 0)


def url_domain_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Explode -> normalize -> per-domain rollup.  One shuffle on the
    domain key; at 100 TB the explode stays narrow (matches only) and
    the groupBy partial-aggregates map-side, so the shuffle carries
    (domain, count) pairs, not documents."""
    urls = df.select(
        F.explode(extract_urls(F.col(text_col))).alias("raw_url")
    ).select(normalize_url(F.col("raw_url")).alias("url"))
    return (
        urls.select(url_domain(F.col("url")).alias("domain"), "url")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("url").alias("n_distinct_urls"),
        )
    )
