"""Spark pipeline vs by-construction goldens — the north-rule correctness
gate: per-turn text + span equality under stable (conv_id, turn_idx)
ordering, including a salted mega-conversation."""

from __future__ import annotations

from pyspark.sql import functions as F

from univer_ocr_spark.generator.transcripts import transcripts_df
from univer_ocr_spark.spark.pipeline import (
    conv_stats,
    detect_skewed_convs,
    run_extraction,
    with_salt,
)

N_CONVS = 40
MEGA = dict(mega_conv_count=1, mega_conv_size=250)


def _assert_matches_golden(rows):
    assert rows, "no rows"
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        assert r["extracted_text"] == r["gold_text"], key
        got = [(s["unit"], s["start"], s["end"]) for s in r["spans"]]
        want = [(s["unit"], s["start"], s["end"]) for s in r["gold_spans"]]
        assert got == want, key
        assert r["kind"] == r["payload_kind"], key


def test_pipeline_matches_golden_per_turn(spark):
    df = transcripts_df(spark, N_CONVS, **MEGA, partitions=6)
    out = run_extraction(df, partitions=6, salt_threshold=100, n_salt=4)
    rows = out.orderBy("conv_id", "turn_idx").collect()
    _assert_matches_golden(rows)
    # mega-conv present and fully extracted
    mega_rows = [r for r in rows if r["conv_id"] == "conv-00000000"]
    assert len(mega_rows) == 250
    assert [r["turn_idx"] for r in mega_rows] == list(range(250))


def test_deterministic_across_partitionings(spark):
    a = run_extraction(transcripts_df(spark, 12, partitions=2))
    b = run_extraction(transcripts_df(spark, 12, partitions=7), partitions=3)
    ra = a.orderBy("conv_id", "turn_idx").collect()
    rb = b.orderBy("conv_id", "turn_idx").collect()
    assert [r.asDict() for r in ra] == [r.asDict() for r in rb]


def test_skew_detection_and_salt(spark):
    df = transcripts_df(spark, 10, **MEGA, with_goldens=False)
    skewed = detect_skewed_convs(df, threshold=100)
    assert skewed == ["conv-00000000"]
    salted = with_salt(df, skewed, n_salt=4)
    dist = (
        salted.filter(F.col("conv_id") == "conv-00000000")
        .groupBy("salt").count().collect()
    )
    assert len(dist) == 4  # mega-conv spread over all salt buckets
    assert salted.filter(
        (F.col("conv_id") != "conv-00000000") & (F.col("salt") != 0)
    ).count() == 0


def test_conv_stats_rollup(spark):
    df = transcripts_df(spark, 8)
    out = run_extraction(df)
    stats = conv_stats(out).orderBy("conv_id").collect()
    assert len(stats) == 8
    # cross-check one conv against a direct ungrouped aggregate
    direct = (
        out.filter(F.col("conv_id") == stats[0]["conv_id"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("c"),
            F.sum("n_spans").alias("s"),
        )
        .collect()[0]
    )
    assert stats[0]["n_turns"] == direct["n"]
    assert stats[0]["total_chars"] == direct["c"]
    assert stats[0]["total_spans"] == direct["s"]
