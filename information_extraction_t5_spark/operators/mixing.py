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
    """
    if not targets:
        raise ValueError("targets must name at least one source")
    if any(w < 0 for w in targets.values()) or sum(targets.values()) == 0:
        raise ValueError("mixture parts must be >= 0 and sum > 0")
    wsum = sum(targets.values())
    weights = docs.sparkSession.createDataFrame(
        list(targets.items()), f"{source_col} string, _w long"
    )
    counts = docs.groupBy(source_col).count().withColumnRenamed(
        "count", "observed"
    )
    rated = counts.join(F.broadcast(weights), source_col, "left")
    if total is None:
        # tiny frame: one extra job over |sources| rows, not the corpus
        total = (
            rated.filter(F.col("_w").isNotNull())
            .agg(F.sum("observed")).collect()[0][0]
        ) or 0
    return rated.select(
        source_col,
        "observed",
        (F.lit(int(total)) * F.coalesce("_w", F.lit(0)))
        .cast("bigint").alias("num"),
        (F.lit(int(wsum)) * F.col("observed")).cast("bigint").alias("den"),
    )


def rebalance_sources(docs: DataFrame, targets: Dict[str, int],
                      total: Optional[int] = None, id_col: str = "doc_id",
                      source_col: str = "source",
                      seed: int = 7) -> DataFrame:
    """Resample ``docs`` to the target mixture; adds a ``copy`` column
    (0 for kept originals, 1.. for up-sampled repeats).

    copies(row) = floor(num/den) + [u(id) < (num mod den)/den], so
    E[output_s] = observed_s * num/den = total * weight_s / sum(weights)
    exactly, and the realized count concentrates tightly around it
    (sum of independent Bernoullis).
    """
    rates = source_rates(docs, targets, total=total, source_col=source_col)
    dec = "decimal(38,0)"
    h1 = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(seed))
                )),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") + 1
    )
    copies = (
        F.expr("num div den")
        + F.when(
            (h1.cast(dec) * F.col("den").cast(dec))
            < ((F.col("num") % F.col("den")).cast(dec)
               * F.lit(_TWO32).cast(dec)),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("int")
    return (
        docs.join(F.broadcast(rates.drop("observed")), source_col, "inner")
        .withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .select(
            *docs.columns,
            F.explode(F.sequence(F.lit(0), F.col("_copies") - 1))
            .alias("copy"),
        )
    )
