"""Iceberg sink protocol against a mocked catalog: this container has no
Iceberg runtime jar, so the partition-spec fail-fast, the snapshot-id
read-back, and the empty-bucket DELETE path are exercised here with the
catalog surfaces (spark.table / spark.sql / DataFrame.writeTo) mocked —
the protocol logic itself runs for real."""

from __future__ import annotations

from unittest import mock

import pytest

from univer_ocr_spark.spark import manifest as mf


def test_assert_bucket_partitioned_accepts_bucket_spec(spark):
    part_ok = spark.createDataFrame(
        [], "partition struct<bucket:int>, record_count long"
    )
    with mock.patch.object(type(spark), "table", return_value=part_ok):
        mf._assert_bucket_partitioned(spark, "lake.db.t")  # must not raise


def test_assert_bucket_partitioned_rejects_other_spec(spark):
    part_bad = spark.createDataFrame(
        [], "partition struct<day:int>, record_count long"
    )
    with mock.patch.object(type(spark), "table", return_value=part_bad):
        with pytest.raises(ValueError, match="partitioned by"):
            mf._assert_bucket_partitioned(spark, "lake.db.t")


def test_assert_bucket_partitioned_rejects_unpartitioned(spark):
    no_part = spark.createDataFrame([], "record_count long")
    with mock.patch.object(type(spark), "table", return_value=no_part):
        with pytest.raises(ValueError, match="no readable partition spec"):
            mf._assert_bucket_partitioned(spark, "lake.db.t")


def test_iceberg_commit_overwrite_and_snapshot_readback(spark):
    snap_df = spark.createDataFrame([(123456789,)], "snapshot_id long")
    seen: list[str] = []
    out = mock.MagicMock()
    out.sparkSession = spark
    with mock.patch.object(
        type(spark), "sql", side_effect=lambda q: seen.append(q) or snap_df
    ):
        snap = mf._iceberg_commit(out, "lake.db.t", bucket=3, n_rows=10)
    assert snap == "123456789"  # lineage the manifest row cites
    out.writeTo.assert_called_once_with("lake.db.t")
    out.writeTo.return_value.overwritePartitions.assert_called_once()
    assert "lake.db.t.snapshots" in seen[-1]


def test_iceberg_commit_empty_bucket_deletes_partition(spark):
    # overwritePartitions on empty output touches nothing — stale rows from
    # a superseded commit would survive; the commit must DELETE explicitly
    snap_df = spark.createDataFrame([(42,)], "snapshot_id long")
    seen: list[str] = []
    out = mock.MagicMock()
    out.sparkSession = spark
    with mock.patch.object(
        type(spark), "sql", side_effect=lambda q: seen.append(q) or snap_df
    ):
        snap = mf._iceberg_commit(out, "lake.db.t", bucket=7, n_rows=0)
    assert snap == "42"
    out.writeTo.assert_not_called()
    assert any("DELETE FROM lake.db.t WHERE bucket = 7" in q for q in seen)
