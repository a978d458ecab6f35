"""Greedy sequence packing for training-batch assembly.

Pretraining dataloaders waste compute on padding unless documents are
packed into fixed-token-budget sequences.  ``pack_sequences`` implements
the standard greedy sequential packer: within each group (shard), rows
are visited in a deterministic order and accumulated into packs until
the next row would overflow the budget; oversized rows get a pack of
their own.  The group key is the unit of parallelism — at 100 TB the
caller shards by a hash bucket (``F.hash(id) % n_shards``) so every
shard packs independently in one ``applyInPandas`` pass: a single
shuffle on the group key, sequential O(rows) per shard, no driver
involvement.  Greedy-by-order (not best-fit) is deliberate: it is
deterministic, oracle-replayable (recursive CTE), and within ~7% of
first-fit-decreasing occupancy on natural-language length distributions.

The per-shard scan is inherently sequential, so shard size — not corpus
size — bounds latency; pick n_shards so a shard's rows fit comfortably
in one Arrow batch (10^5-10^6 rows).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pack_sequences(
    df: DataFrame,
    group_col: str = "source",
    order_col: str = "doc_id",
    size_col: str = "n_tokens",
    max_units: int = 512,
) -> DataFrame:
    """Assign ``pack_id`` (0-based per group) and ``pack_pos`` (0-based
    within the pack) greedily over ``order_col`` order.

    Exact contract (the DuckDB oracle replays it as a recursive CTE):
    walk the group's rows sorted by ``order_col``; a row joins the
    current pack unless the pack is non-empty and adding the row's size
    would exceed ``max_units``, in which case it starts the next pack.
    A row larger than ``max_units`` therefore always sits alone.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", pack_id int, pack_pos int"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        acc = 0
        pid = 0
        nxt = 0
        ids: list[int] = []
        pos: list[int] = []
        for s in pdf[size_col]:
            s = int(s)
            if acc > 0 and acc + s > max_units:
                pid += 1
                acc = 0
                nxt = 0
            pos.append(nxt)
            nxt += 1
            ids.append(pid)
            acc += s
        pdf["pack_id"] = ids
        pdf["pack_pos"] = pos
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, schema=out_schema)


def pack_occupancy(packed: DataFrame,
                   group_col: str = "source",
                   size_col: str = "n_tokens",
                   max_units: int = 512) -> DataFrame:
    """Per-group packing efficiency: packs used and mean fill fraction —
    the number a capacity planner actually checks."""
    from pyspark.sql import functions as F

    per_pack = packed.groupBy(group_col, "pack_id").agg(
        F.sum(size_col).alias("units")
    )
    return per_pack.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg(F.least(F.col("units"), F.lit(max_units)))
                / max_units, 6).alias("mean_fill"),
    )
