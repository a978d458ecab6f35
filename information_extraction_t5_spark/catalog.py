"""Table catalog + checkpoint/resume layer.

Production target is Iceberg (atomic snapshot commits, partition evolution,
time travel); this sandbox has no Iceberg jars, so the catalog abstracts the
storage format: ``format='iceberg'`` when the runtime has it, parquet
warehouse directories otherwise.  Resume semantics mirror the reference's
prediction-cache skip-guard (reference: models/qa_model.py:144-145,206-211,
344-349): a stage whose committed snapshot exists is skipped and read back.

Each commit writes a ``_lineage.json`` sidecar with row counts, wall time,
partition count and input fingerprints — the per-partition lineage + metrics
the north rule requires, committed atomically-enough for parquet (tmp dir +
rename) and natively atomic under Iceberg.

Explicit delta vs Iceberg-proper (r6; jars still absent from the sandbox):
the backend branch is now REAL code — ``_commit_iceberg`` does an atomic
``writeTo(...).using('iceberg').createOrReplace()``, records the snapshot
id + per-file row counts from the table's own metadata tables into the
lineage sidecar, ``read``/``read_snapshot`` go through
``spark.read.table`` (with ``snapshot-id`` time travel) — and
``_detect_format`` selects it only when a ``spark.sql.catalog.<name>``
conf is set AND the Iceberg runtime class loads (JVM reflection probe).
What IS exercised here — stage skip/resume across JVMs
(tests/test_submit.py poison-pill), lineage sidecars, partitioned layout
with pruning (test_materialize_pruning), single-job commits, and the
backend contract through a fake Iceberg store
(tests/test_catalog_iceberg.py format matrix).  What still needs real
jars — executing ``_commit_iceberg`` verbatim (snapshot/files metadata
queries), partition-spec evolution, hidden-partition transforms, and
concurrent optimistic commits.
"""
from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageCommit:
    name: str
    rows: int
    seconds: float
    num_partitions: int
    extra: dict


class Catalog:
    """Warehouse of checkpointed stage tables."""

    def __init__(self, spark: SparkSession, warehouse: str,
                 fmt: Optional[str] = None, catalog_name: str = "iceberg",
                 namespace: str = "kg"):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog_name = catalog_name
        self.namespace = namespace
        self.fmt = fmt or self._detect_format()
        os.makedirs(warehouse, exist_ok=True)

    def _detect_format(self) -> str:
        """'iceberg' only when BOTH a spark.sql.catalog.<name> conf is set
        AND the Iceberg runtime class is actually loadable (r6: a conf
        without jars previously selected a backend that would fail at
        first write)."""
        try:
            self.spark.conf.get(f"spark.sql.catalog.{self.catalog_name}")
        except Exception:
            return "parquet"
        return "iceberg" if self._iceberg_runtime_present() else "parquet"

    def _iceberg_runtime_present(self) -> bool:
        """JVM reflection probe for the Iceberg SparkCatalog class —
        cheap, no side effects, and mockable in the format-matrix test."""
        try:
            jvm = self.spark._jvm  # noqa: SLF001 - no public class probe
            jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False

    def _identifier(self, name: str) -> str:
        return f"{self.catalog_name}.{self.namespace}.{name}"

    # -- paths -----------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _lineage_path(self, name: str) -> str:
        return os.path.join(self.path(name), "_lineage.json")

    # -- snapshot state ---------------------------------------------------
    def exists(self, name: str) -> bool:
        """A table exists only if its lineage sidecar was committed —
        half-written output from a killed run does not count."""
        return os.path.exists(self._lineage_path(name))

    def drop(self, name: str) -> None:
        if self.fmt == "iceberg":
            # ADVICE r6: under the iceberg backend the table itself must
            # go too — rmtree only removes the local sidecar, leaving
            # orphaned data + readable stale snapshots
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self._identifier(name)}"
            )
        shutil.rmtree(self.path(name), ignore_errors=True)

    # -- IO ----------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: Optional[List[str]] = None,
        mode: str = "overwrite",
        extra_lineage: Optional[dict] = None,
    ) -> StageCommit:
        t0 = time.time()
        if self.fmt == "iceberg":
            part_counts, backend = self._commit_iceberg(
                df, name, partition_by
            )
        else:
            part_counts, backend = self._commit_parquet(
                df, name, partition_by, mode
            )
        rows = sum(part_counts)
        nparts = max(len(part_counts), 1)
        skew = {
            "partition_rows_min": min(part_counts, default=0),
            "partition_rows_max": max(part_counts, default=0),
            "partition_rows_mean": round(rows / nparts, 1),
            **backend,
        }

        commit = StageCommit(
            name=name,
            rows=rows,
            seconds=round(time.time() - t0, 3),
            num_partitions=nparts,
            extra=extra_lineage or {},
        )
        # the sidecar is the Catalog's OWN commit marker + metrics record,
        # backend-independent (under Iceberg the table data lives in the
        # Iceberg warehouse; this directory holds only the sidecar)
        os.makedirs(self.path(name), exist_ok=True)
        with open(self._lineage_path(name), "w") as f:
            json.dump(
                {
                    "table": name,
                    "rows": rows,
                    "seconds": commit.seconds,
                    "rows_per_sec": round(rows / max(commit.seconds, 1e-9),
                                          1),
                    "partitions": nparts,
                    "partition_by": partition_by or [],
                    "committed_at": time.time(),
                    **skew,
                    **commit.extra,
                },
                f,
            )
        return commit

    def _commit_parquet(self, df: DataFrame, name: str,
                        partition_by: Optional[List[str]],
                        mode: str):
        """tmp-dir + rename parquet commit (atomic-enough for local/HDFS).

        Per-partition lineage from parquet FOOTERS (KBs of metadata per
        file), not a second scan of the data — at 100 TB a read-back
        groupBy would double checkpoint I/O.  One Spark job per commit
        (the write itself); pinned by tests/test_catalog_lineage.py."""
        target = self.path(name)
        tmp = target + ".__tmp__"
        shutil.rmtree(tmp, ignore_errors=True)

        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)

        part_counts = self._footer_row_counts(tmp)
        if mode == "overwrite":
            shutil.rmtree(target, ignore_errors=True)
        os.replace(tmp, target)
        return part_counts, {}

    def _commit_iceberg(self, df: DataFrame, name: str,
                        partition_by: Optional[List[str]]):
        """Native Iceberg commit: createOrReplace is one atomic snapshot
        swap (no tmp-dir dance needed), and the per-file row counts +
        snapshot id come from the table's own metadata tables — the
        manifest already carries what the parquet path digs out of
        footers.  Requires the Iceberg runtime (detect_format gates on
        it); exercised logic-level by tests/test_catalog_iceberg.py and
        for real wherever the jars are on the classpath."""
        ident = self._identifier(name)
        self.spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS "
            f"{self.catalog_name}.{self.namespace}"
        )
        writer = df.writeTo(ident).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(
                *[F.col(c) for c in partition_by]
            )
        writer.createOrReplace()
        snap = self.spark.sql(
            f"SELECT snapshot_id FROM {ident}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        files = self.spark.sql(
            f"SELECT record_count FROM {ident}.files"
        ).collect()
        part_counts = [int(r[0]) for r in files]
        return part_counts, {
            "snapshot_id": int(snap[0][0]) if snap else None,
            "iceberg_table": ident,
        }

    @staticmethod
    def _footer_row_counts(root: str) -> List[int]:
        """Row count per output file, read from parquet footer metadata
        (pyarrow reads only the footer, never the column data).  On a real
        cluster this is the same information an Iceberg snapshot manifest
        carries for free."""
        import pyarrow.parquet as pq

        counts: List[int] = []
        for dirpath, _dirs, files in os.walk(root):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                meta = pq.ParquetFile(os.path.join(dirpath, fn)).metadata
                counts.append(meta.num_rows)
        return counts

    def read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(self._identifier(name))
        return self.spark.read.parquet(self.path(name))

    def read_snapshot(self, name: str, snapshot_id: int) -> DataFrame:
        """Time travel (Iceberg only): read the table as of a committed
        snapshot — e.g. the id recorded in a stage's lineage sidecar."""
        if self.fmt != "iceberg":
            raise NotImplementedError(
                "time travel needs the Iceberg backend; the parquet "
                "fallback keeps only the latest commit"
            )
        return (
            self.spark.read.option("snapshot-id", int(snapshot_id))
            .table(self._identifier(name))
        )

    def lineage(self, name: str) -> dict:
        with open(self._lineage_path(name)) as f:
            return json.load(f)

    # -- resumable stage ---------------------------------------------------
    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: Optional[List[str]] = None,
        force: bool = False,
        extra_lineage: Optional[dict] = None,
    ) -> DataFrame:
        """Idempotent stage: skip recompute when the snapshot is committed
        (kill the job mid-run; the restart resumes here)."""
        if not force and self.exists(name):
            return self.read(name)
        self.write(build(), name, partition_by=partition_by,
                   extra_lineage=extra_lineage)
        return self.read(name)
