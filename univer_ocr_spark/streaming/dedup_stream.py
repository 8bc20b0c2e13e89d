"""Streaming exact dedup: min-doc_id-wins over a content fingerprint.

The streaming twin of ops/dedup.dedup_exact — a stateful
``groupBy(fingerprint).agg(min(doc_id))`` whose state spans micro-batches,
so the keeper per fingerprint is EXACTLY the batch min(doc_id) canonical
regardless of arrival order (within-batch and across batches; a
first-seen ``dropDuplicates`` would instead keep an arbitrary same-batch
row). On a live cluster add a watermark to bound state to the dedup
horizon; AvailableNow keeps tests deterministic.
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


def stream_keepers(spark: SparkSession, query_name: str = "dedup_stream") -> DataFrame:
    """Complete mode rewrites the memory table each batch with the full
    aggregation state — the final table IS one (min doc_id, fingerprint)
    row per key."""
    return spark.table(query_name).select("doc_id", "fingerprint").orderBy("doc_id")
