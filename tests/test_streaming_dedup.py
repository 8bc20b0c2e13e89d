"""Streaming min-wins dedup must keep exactly the batch canonical set —
including duplicates split ACROSS micro-batches AND a same-batch duplicate
whose larger id arrives alongside the original (where first-seen semantics
would be nondeterministic)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from univer_ocr_spark.ops.dedup import dedup_exact
from univer_ocr_spark.streaming.dedup_stream import (
    dedup_stream_parquet_dir,
    stream_keepers,
)

SF = "/root/testdata/sf0.001"


def test_stream_dedup_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    # cross-batch duplicates: copies of docs 0..4 land in the SECOND file
    dup_cross = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    # same-batch duplicate: a copy of a second-file doc, larger id, SAME file
    base_id = n // 2
    dup_same = docs.filter(F.col("doc_id") == base_id).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    all_docs = docs.union(dup_cross).union(dup_same)

    src = str(tmp_path / "src")
    first = all_docs.filter(F.col("doc_id") < base_id)
    second = all_docs.filter(F.col("doc_id") >= base_id)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # distinct mtimes: file order = trigger order
    second.coalesce(1).write.mode("append").parquet(src)

    # batch truth over the SAME (docs + planted dups) table
    batch_src = str(tmp_path / "batch")
    all_docs.write.mode("overwrite").parquet(
        str(tmp_path / "batch" / "documents.parquet")
    )
    want = {
        (r["doc_id"], r["fingerprint"])
        for r in dedup_exact(spark, batch_src).filter(~F.col("is_dup")).collect()
    }

    dedup_stream_parquet_dir(spark, src, query_name="dedup_t")
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in stream_keepers(spark, "dedup_t").collect()
    }
    assert got == want
    assert len(got) == n  # all 6 planted dups were suppressed
