"""Streaming exact dedup: first-seen-wins over a content fingerprint.

The streaming twin of ops/dedup.dedup_exact — ``dropDuplicates`` on a
fingerprint column keeps per-key state across micro-batches, so a document
whose duplicate arrived in an earlier file is suppressed (the online form
of the batch min-per-fingerprint canonicalization; with time-ordered
arrival the keeper sets coincide). On a live cluster add a watermark to
bound state to the dedup horizon; AvailableNow keeps tests deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fingerprint(col):
    return F.md5(
        F.encode(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")), "UTF-8")
    )


def dedup_stream_parquet_dir(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "dedup_stream",
) -> None:
    """Stream docs from ``input_dir`` (one file per micro-batch), emit only
    the first document seen per fingerprint; blocks until drained."""
    schema = spark.read.parquet(input_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # dedup state must span batches
        .parquet(input_dir)
    )
    out = src.withColumn("fingerprint", _fingerprint(F.col("text"))).dropDuplicates(
        ["fingerprint"]
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
    return spark.table(query_name).select("doc_id", "fingerprint").orderBy("doc_id")
