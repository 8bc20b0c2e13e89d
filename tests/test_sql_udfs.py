"""The SQL function surface must return exactly what the pipeline stage
returns — same implementation, third harness (DataFrame, streaming, SQL)."""

from __future__ import annotations

from univer_ocr_spark.generator.transcripts import transcripts_df
from univer_ocr_spark.spark.pipeline import run_extraction
from univer_ocr_spark.spark.sql_udfs import register_sql_udfs


def test_sql_udfs_match_pipeline(spark):
    register_sql_udfs(spark)
    transcripts_df(spark, 6, with_goldens=False).createOrReplaceTempView(
        "transcripts_sql_t"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["t"], r["k"], r["s"])
        for r in spark.sql(
            "SELECT conv_id, turn_idx, extract_text(text) AS t,"
            " extract_kind(text) AS k, extract_spans(text) AS s"
            " FROM transcripts_sql_t"
        ).collect()
    }
    want_df = run_extraction(spark.table("transcripts_sql_t"))
    n = 0
    for r in want_df.collect():
        t, k, s = got[(r["conv_id"], r["turn_idx"])]
        assert t == r["extracted_text"]
        assert k == r["kind"]
        assert [(x["unit"], x["start"], x["end"]) for x in s] == [
            (x["unit"], x["start"], x["end"]) for x in r["spans"]
        ]
        n += 1
    assert n == len(got) > 0
