"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin,
comparing row count, sorted column names, and an order-insensitive value
hash (rows stringified, sorted, md5).  Strict: any difference prints a diff
sample.  Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted(
        "|".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from information_extraction_t5_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} != {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}"
            )
        if not problems and value_hash(sdf) != value_hash(ddf):
            problems.append("value hash mismatch")
            sc = sorted(sdf.columns)
            a = sdf[sc].astype(str).sort_values(sc).reset_index(drop=True)
            b = ddf[sc].astype(str).sort_values(sc).reset_index(drop=True)
            neq = (a != b).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"first diff @ {i}: spark={a.loc[i].to_dict()} "
                    f"duck={b.loc[i].to_dict()}"
                )
            else:
                problems.append("(stringified frames equal; float fmt diff)")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
