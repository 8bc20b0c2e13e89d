"""Stateful streaming sessionization must equal the batch window-function
sessionization, with state genuinely carried across micro-batches (input is
split into two time-ordered files, one per trigger)."""

from __future__ import annotations

from univer_ocr_spark.ops.relational import q_sessionize_events
from univer_ocr_spark.streaming.stateful import (
    final_session_counts,
    stateful_sessionize_stream,
)

SF = "/root/testdata/sf0.001"


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    import time

    from pyspark.sql import Window as W, functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    src = str(tmp_path / "src")
    # two time-ordered halves -> two micro-batches; sessions spanning the
    # cut prove state carries across triggers. Deterministic split: a
    # row_number over a total order (limit+subtract would re-evaluate a
    # nondeterministic limit and EXCEPT-dedup identical rows)
    ranked = ev.withColumn(
        "_rn", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    first = ranked.filter(F.col("_rn") <= n // 2).drop("_rn")
    second = ranked.filter(F.col("_rn") > n // 2).drop("_rn")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # distinct mtimes: file order = trigger order
    second.coalesce(1).write.mode("append").parquet(src)

    stateful_sessionize_stream(spark, src, query_name="sess_test")
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in final_session_counts(spark, "sess_test").collect()
    }
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_sessionize_events(spark, SF).collect()
    }
    assert got == want

    # out-of-order arrival: the LATER half lands first. Interval-union state
    # must still converge to the batch answer (no split/overcounted sessions).
    src2 = str(tmp_path / "src_ooo")
    second.coalesce(1).write.mode("overwrite").parquet(src2)
    time.sleep(1.1)
    first.coalesce(1).write.mode("append").parquet(src2)
    stateful_sessionize_stream(spark, src2, query_name="sess_ooo")
    got_ooo = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in final_session_counts(spark, "sess_ooo").collect()
    }
    assert got_ooo == want
