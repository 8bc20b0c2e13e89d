"""Streaming extraction must equal batch extraction (same stage, two
harnesses)."""

from __future__ import annotations

from univer_ocr_spark.generator.transcripts import transcripts_df
from univer_ocr_spark.spark.pipeline import run_extraction
from univer_ocr_spark.streaming.stream_extract import (
    read_stream_output,
    stream_extract_parquet_dir,
)


def _key_rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["n_spans"])
        for r in df.select("conv_id", "turn_idx", "extracted_text", "n_spans").collect()
    )


def test_stream_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")

    df = transcripts_df(spark, 10, with_goldens=False)
    df.write.parquet(src_dir)

    stream_extract_parquet_dir(spark, src_dir, out_dir, ckpt_dir)

    got = _key_rows(read_stream_output(spark, out_dir))
    want = _key_rows(run_extraction(spark.read.parquet(src_dir)))
    assert got == want
    assert len(got) > 0


def test_stream_resume_processes_only_new_files(spark, tmp_path):
    """Incremental exactly-once: a second drain against the SAME checkpoint
    must append exactly the newly arrived files' rows — nothing reprocessed
    (no duplicates from batch 1), nothing lost. This is the streaming twin
    of the batch manifest's resume contract."""
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")

    all_df = transcripts_df(spark, 12, with_goldens=False)
    first = all_df.filter("conv_id <= 'conv-00000005'")
    second = all_df.filter("conv_id > 'conv-00000005'")

    first.write.mode("append").parquet(src_dir)
    stream_extract_parquet_dir(spark, src_dir, out_dir, ckpt_dir)
    got1 = _key_rows(read_stream_output(spark, out_dir))
    assert got1 == _key_rows(run_extraction(first))

    second.write.mode("append").parquet(src_dir)
    stream_extract_parquet_dir(spark, src_dir, out_dir, ckpt_dir)
    got2 = _key_rows(read_stream_output(spark, out_dir))
    assert got2 == _key_rows(run_extraction(all_df))  # union, no dupes
