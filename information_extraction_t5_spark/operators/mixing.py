"""Domain-mix rebalancing: resample a corpus to a target per-source
mixture (The Pile / Dolma / FineWeb "mixing weights" stage).

Given integer mixture parts per source (e.g. ``{"web": 6, "books": 3,
"code": 1}``) and an output size, each source is deterministically
down-sampled (keep probability < 1) or up-sampled (documents repeated,
fractional remainder Bernoulli) to hit its share of the output.

Scale + determinism shape:

- The only aggregation is ``groupBy(source).count()`` — |sources| rows,
  a trivially small shuffle at any corpus size.  The per-source rates
  join back via broadcast, and the keep/repeat decision is a pure
  per-row expression fused into the scan: the corpus is never shuffled.
- Randomness is the repo's replayable-draw convention (see
  ``sampling._uniform``): u = (md5(id:seed)[0:8] as int + 1) / 2^32.
  The keep test is evaluated in INTEGER arithmetic —
  ``(h+1) * den < rem * 2^32`` over decimal(38,0) — so the DuckDB
  oracle replays it bit-exactly with hugeints; no float-boundary row
  flips (the r2 lesson: integer-exact outputs dodge cross-engine
  rounding).
- Up-sampling emits a ``copy`` ordinal (0..copies-1) so downstream
  dedup-sensitive stages can distinguish intentional repeats.

Net-new curation layer (no counterpart in the reference pipeline —
/root/reference/information_extraction_t5 trains on a fixed dataset);
mandated alongside SURVEY.md §2.
"""
from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, functions as F

_TWO32 = 4294967296  # 2^32, the draw denominator in sampling._uniform


def source_rates(docs: DataFrame, targets: Dict[str, int],
                 total: Optional[int] = None,
                 source_col: str = "source") -> DataFrame:
    """Per-source resampling rate as an exact rational:
    ``(source, observed, num, den)`` with rate = num/den =
    total * weight_s / (sum(weights) * observed_s).

    Sources absent from ``targets`` get rate 0 (dropped).  ``total``
    defaults to the input row count of the TARGETED sources, i.e. pure
    re-mixing at constant size.

    A target naming a source with ZERO observed documents raises — the
    requested mixture is unreachable, and silently renormalizing over the
    present sources would skew every other share (ADVICE r5: a misspelled
    source in ``targets`` previously vanished through the left join).

    One blocking job regardless of ``total``: the per-source counts
    (|sources| rows) are collected for validation and the rates frame is
    rebuilt locally, so the corpus-wide scan happens exactly once and the
    returned frame broadcasts for free.
    """
    if not targets:
        raise ValueError("targets must name at least one source")
    if any(w < 0 for w in targets.values()) or sum(targets.values()) == 0:
        raise ValueError("mixture parts must be >= 0 and sum > 0")
    wsum = sum(targets.values())
    observed = {
        r[0]: r[1]
        for r in docs.groupBy(source_col).count().collect()
    }
    missing = sorted(
        s for s, w in targets.items() if w > 0 and not observed.get(s)
    )
    # NULL sources sort None-safely (ADVICE r6: a None key made sorted()
    # raise; the pre-r6 left-join form passed NULL sources through with
    # rate 0 — keep that behavior)
    none_safe = lambda s: (s is None, s or "")  # noqa: E731
    if missing:
        raise ValueError(
            f"targets name sources with no observed documents: {missing} "
            f"(observed sources: {sorted(observed, key=none_safe)})"
        )
    if total is None:
        total = sum(n for s, n in observed.items() if targets.get(s))
    rows = [
        (s, int(n), int(total) * int(targets.get(s, 0)), int(wsum) * int(n))
        for s, n in sorted(observed.items(), key=lambda kv: none_safe(kv[0]))
    ]
    return docs.sparkSession.createDataFrame(
        rows, f"{source_col} string, observed long, num long, den long"
    )


def rebalance_sources(docs: DataFrame, targets: Dict[str, int],
                      total: Optional[int] = None, id_col: str = "doc_id",
                      source_col: str = "source",
                      seed: int = 7) -> DataFrame:
    """Resample ``docs`` to the target mixture; adds a ``copy`` column
    (0 for kept originals, 1.. for up-sampled repeats).

    copies(row) = floor(num/den) + [u(id, source) < (num mod den)/den], so
    E[output_s] = observed_s * num/den = total * weight_s / sum(weights)
    exactly, and the realized count concentrates tightly around it
    (sum of independent Bernoullis).

    The draw is salted with ``source_col`` as well as ``id_col`` (ADVICE
    r5): ids only need to be unique WITHIN a source — the same id in two
    sources gets independent keep/repeat decisions.  Internal join
    columns carry a ``__mix_`` prefix so user frames that already have
    ``num``/``den``/``copy``-adjacent names can't collide.
    """
    rates = source_rates(docs, targets, total=total, source_col=source_col)
    mix = rates.select(
        source_col,
        F.col("num").alias("__mix_num"),
        F.col("den").alias("__mix_den"),
    )
    dec = "decimal(38,0)"
    h1 = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", F.col(id_col).cast("string"),
                    F.col(source_col).cast("string"), F.lit(str(seed))
                )),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") + 1
    )
    copies = (
        F.expr("__mix_num div __mix_den")
        + F.when(
            (h1.cast(dec) * F.col("__mix_den").cast(dec))
            < ((F.col("__mix_num") % F.col("__mix_den")).cast(dec)
               * F.lit(_TWO32).cast(dec)),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("int")
    return (
        docs.join(F.broadcast(mix), source_col, "inner")
        .withColumn("__mix_copies", copies)
        .filter(F.col("__mix_copies") > 0)
        .select(
            *docs.columns,
            F.explode(F.sequence(F.lit(0), F.col("__mix_copies") - 1))
            .alias("copy"),
        )
    )
