"""Streaming exact dedup: min-doc_id-wins over a content fingerprint.

The streaming twin of ops/dedup.dedup_exact — a stateful
``groupBy(fingerprint).agg(min(doc_id))`` whose state spans micro-batches,
so the keeper per fingerprint is EXACTLY the batch min(doc_id) canonical
regardless of arrival order (within-batch and across batches; a
first-seen ``dropDuplicates`` would instead keep an arbitrary same-batch
row). AvailableNow keeps tests deterministic.

Two state regimes:
- ``dedup_stream_parquet_dir`` — UNBOUNDED state (exact forever-dedup);
  right for replays/backfills, grows with distinct fingerprints.
- ``dedup_stream_watermarked`` — state bounded to an EVENT-TIME horizon
  (watermark + ``dropDuplicatesWithinWatermark``): the production shape
  for an endless stream. The documented trade: a duplicate arriving more
  than ``horizon`` after its original's event time is re-emitted (state
  for the original has been reclaimed), and emission is FIRST-ARRIVING
  within the horizon, not global min-id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from univer_ocr_spark.ops.dedup import fingerprint_expr


def dedup_stream_parquet_dir(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "dedup_stream",
) -> None:
    """Stream docs from ``input_dir`` (one file per micro-batch), maintain
    the min doc_id per fingerprint across batches; blocks until drained."""
    schema = spark.read.parquet(input_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # dedup state must span batches
        .parquet(input_dir)
    )
    out = (
        src.withColumn("fingerprint", fingerprint_expr(F.col("text")))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")  # memory table = the converged keeper set
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream_watermarked(
    spark: SparkSession,
    input_dir: str,
    horizon: str = "10 minutes",
    query_name: str = "dedup_stream_wm",
) -> None:
    """Bounded-state streaming dedup: emit the first-arriving row per
    content fingerprint, suppress duplicates whose event time falls within
    ``horizon`` of the kept row, and RECLAIM state once the watermark
    passes the horizon — state size is bounded by the horizon's distinct
    fingerprints, not the stream's lifetime (the r2 variant grew forever).

    Uses ``withWatermark(ts) + dropDuplicatesWithinWatermark(fingerprint)``
    (Structured Streaming's purpose-built bounded dedup operator). Late
    duplicates BEYOND the horizon are re-emitted — the documented miss that
    makes bounded state possible; a downstream batch `dedup_exact` over any
    window restores exactness where needed. Blocks until drained
    (AvailableNow); the memory sink runs append mode, so the result table
    accretes emissions across micro-batches.
    """
    schema = spark.read.parquet(input_dir).schema  # needs an event-time ts
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # state must span micro-batches
        .parquet(input_dir)
    )
    out = (
        src.withColumn("fingerprint", fingerprint_expr(F.col("text")))
        .withWatermark("ts", horizon)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_keepers(spark: SparkSession, query_name: str = "dedup_stream") -> DataFrame:
    """Complete mode rewrites the memory table each batch with the full
    aggregation state — the final table IS one (min doc_id, fingerprint)
    row per key."""
    return spark.table(query_name).select("doc_id", "fingerprint").orderBy("doc_id")
