"""Catalog backend format matrix (VERDICT r5 item 7).

Two layers, honestly separated:

1. The FORMAT PROBE is tested for real: an Iceberg catalog conf alone
   must NOT select the iceberg backend when the runtime class is absent
   (this sandbox), and must select it when the class probe succeeds.
2. The BACKEND CONTRACT (stage/skip/resume/lineage identical through
   either backend, snapshot ids surfaced in the sidecar) is tested
   through a fake Iceberg store that overrides exactly the two jar-bound
   seams (``_commit_iceberg``, ``read``).  Executing the real
   ``_commit_iceberg`` body (writeTo + snapshots/files metadata queries)
   requires the Iceberg runtime on the classpath and stays environment-
   gated — the point pinned here is that nothing ABOVE the seams assumes
   a file layout.
"""
import os

import pytest

from information_extraction_t5_spark.catalog import Catalog


# ---------------------------------------------------------------------------
# 1. the probe
# ---------------------------------------------------------------------------


def test_detect_format_defaults_to_parquet(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    assert cat.fmt == "parquet"


def test_conf_without_runtime_stays_parquet(spark, tmp_path):
    spark.conf.set("spark.sql.catalog.iceberg",
                   "org.apache.iceberg.spark.SparkCatalog")
    try:
        cat = Catalog(spark, str(tmp_path / "wh"))
        # the class probe fails in this sandbox -> fallback, not a
        # backend that would explode on first write (r6 fix)
        assert cat.fmt == "parquet"
    finally:
        spark.conf.unset("spark.sql.catalog.iceberg")


def test_conf_with_runtime_selects_iceberg(spark, tmp_path, monkeypatch):
    spark.conf.set("spark.sql.catalog.iceberg",
                   "org.apache.iceberg.spark.SparkCatalog")
    monkeypatch.setattr(Catalog, "_iceberg_runtime_present",
                        lambda self: True)
    try:
        cat = Catalog(spark, str(tmp_path / "wh"))
        assert cat.fmt == "iceberg"
        assert cat._identifier("edges") == "iceberg.kg.edges"
    finally:
        spark.conf.unset("spark.sql.catalog.iceberg")


def test_explicit_fmt_wins(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), fmt="iceberg")
    assert cat.fmt == "iceberg"


# ---------------------------------------------------------------------------
# 2. the backend contract
# ---------------------------------------------------------------------------


class FakeIcebergCatalog(Catalog):
    """Catalog with the two jar-bound seams replaced by a local table
    store that mimics Iceberg's observable behavior: atomic replace,
    monotonically increasing snapshot ids, per-file record counts."""

    def __init__(self, *a, **kw):
        kw.setdefault("fmt", "iceberg")
        super().__init__(*a, **kw)
        self._snap = 0

    def _store(self, name: str) -> str:
        return os.path.join(self.warehouse, "__iceberg_store__", name)

    def _commit_iceberg(self, df, name, partition_by):
        self._snap += 1
        target = self._store(name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        part_counts = self._footer_row_counts(target)
        return part_counts, {
            "snapshot_id": self._snap,
            "iceberg_table": self._identifier(name),
        }

    def read(self, name: str):
        return self.spark.read.parquet(self._store(name))


@pytest.fixture
def small_df(spark):
    return spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(30)], ["id", "pred"]
    )


def _run_stage_sequence(cat: Catalog, df):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return df

    first = cat.stage("s1", build, partition_by=["pred"])
    again = cat.stage("s1", build, partition_by=["pred"])  # must skip
    return first, again, calls


def test_stage_contract_identical_across_backends(spark, tmp_path, small_df):
    pq = Catalog(spark, str(tmp_path / "pq"), fmt="parquet")
    ib = FakeIcebergCatalog(spark, str(tmp_path / "ib"))

    rows = {}
    for label, cat in (("parquet", pq), ("iceberg", ib)):
        first, again, calls = _run_stage_sequence(cat, small_df)
        assert calls["n"] == 1, f"{label}: committed stage rebuilt"
        assert cat.exists("s1")
        rows[label] = sorted(map(tuple, again.collect()))
        lin = cat.lineage("s1")
        assert lin["rows"] == 30
        assert lin["partition_by"] == ["pred"]
    assert rows["parquet"] == rows["iceberg"]


def test_iceberg_sidecar_carries_snapshot_id(spark, tmp_path, small_df):
    ib = FakeIcebergCatalog(spark, str(tmp_path / "ib"))
    ib.write(small_df, "t1")
    lin1 = ib.lineage("t1")
    assert lin1["snapshot_id"] == 1
    assert lin1["iceberg_table"] == "iceberg.kg.t1"
    ib.write(small_df, "t1")  # replace -> new snapshot
    assert ib.lineage("t1")["snapshot_id"] == 2
    # parquet backend records no snapshot id (no such concept)
    pq = Catalog(spark, str(tmp_path / "pq"), fmt="parquet")
    pq.write(small_df, "t1")
    assert "snapshot_id" not in pq.lineage("t1")


def test_parquet_time_travel_raises(spark, tmp_path, small_df):
    pq = Catalog(spark, str(tmp_path / "pq"), fmt="parquet")
    pq.write(small_df, "t1")
    with pytest.raises(NotImplementedError):
        pq.read_snapshot("t1", 1)
