"""Iceberg auto-arm (VERDICT r4 #6): the production design writes the
span and lineage tables to Iceberg (checkpoint.py:12-14 — one
writeTo().append() snapshot per bucket; resume = read committed
snapshots). The Iceberg runtime jars are NOT in this container, so
these tests skip today — gated exactly like the h5py differential:
the moment `org.apache.iceberg.spark.SparkCatalog` resolves on the
session's classpath they arm and exercise writeTo / append /
time-travel of the lineage table with zero code changes."""

from __future__ import annotations

import datetime

import pytest


def _iceberg_class_resolves(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@pytest.fixture()
def ice(spark, tmp_path):
    if not _iceberg_class_resolves(spark):
        pytest.skip(
            "Iceberg runtime jars absent (org.apache.iceberg.spark."
            "SparkCatalog does not resolve) — add "
            "iceberg-spark-runtime to spark.jars and this suite arms "
            "automatically"
        )
    # catalogs are instantiated lazily at first lookup, so a runtime
    # conf set before first use is honored
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "warehouse"))
    return "ice"


def _lineage_row(bucket: int, run_id: str = "r1") -> dict:
    return {
        "run_id": run_id,
        "bucket": bucket,
        "n_docs": 10,
        "n_lines": 100,
        "n_chars": 1000,
        "sum_dist": 1.5,
        "cer": 0.0015,
        "wall_sec": 0.5,
        "docs_per_sec": 20.0,
        "finished_at": datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
    }


def test_lineage_writeto_append_time_travel(spark, ice):
    """Create the lineage table via writeTo, append one snapshot per
    bucket (the checkpoint loop's commit grain), then time-travel back
    to the first snapshot: it must show exactly the first bucket —
    the property resume depends on (a torn run is invisible until its
    snapshot commits)."""
    from cor_asv_ann_spark.schema import LINEAGE_SCHEMA

    tbl = f"{ice}.db.lineage"
    spark.createDataFrame([_lineage_row(0)], schema=LINEAGE_SCHEMA) \
        .writeTo(tbl).createOrReplace()
    for b in (1, 2):
        spark.createDataFrame([_lineage_row(b)], schema=LINEAGE_SCHEMA) \
            .writeTo(tbl).append()
    assert spark.table(tbl).count() == 3

    snaps = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at") \
        .collect()
    assert len(snaps) == 3
    first = snaps[0].snapshot_id
    tt = spark.sql(f"SELECT bucket FROM {tbl} VERSION AS OF {first}").collect()
    assert [r.bucket for r in tt] == [0]
    # resume surface: completed buckets at HEAD
    got = {r.bucket for r in spark.table(tbl).select("bucket").collect()}
    assert got == {0, 1, 2}


def test_spans_writeto_roundtrip(spark, ice, sf_small):
    """Span table through the Iceberg path of iceberg_or_parquet_write:
    writeTo a catalog table and read back value-identical."""
    from pyspark.sql import functions as F

    from cor_asv_ann_spark.sources.spans import (
        iceberg_or_parquet_write,
        synth_spans,
    )

    spans = synth_spans(spark, sf_small).limit(50)
    fmt = iceberg_or_parquet_write(spans, f"{ice}.db.spans")
    assert fmt == "iceberg"
    back = spark.table(f"{ice}.db.spans")
    a = spans.select("doc_id", F.to_json("spans").alias("j")).collect()
    b = back.select("doc_id", F.to_json("spans").alias("j")).collect()
    assert sorted((r.doc_id, r.j) for r in a) == sorted((r.doc_id, r.j) for r in b)
