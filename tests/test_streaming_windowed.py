"""Watermarked windowed streaming aggregate vs its batch twin.

With AvailableNow + append mode, windows older than the watermark at
end-of-stream are emitted; the final watermark may hold back the trailing
window(s), so the streamed result must be a prefix-subset of the batch
result and exactly equal on every window it emitted."""

from __future__ import annotations

from univer_ocr_spark.streaming.windowed import (
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (r["w_start"], r["w_end"], r["event_type"]): (r["n"], r["total"])
        for r in df.collect()
    }


def test_windowed_stream_matches_batch(spark, tmp_path):
    import shutil

    src = str(tmp_path / "src")  # file stream sources need a directory
    (tmp_path / "src").mkdir()
    shutil.copy(f"{SF}/events.parquet", src)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    windowed_event_counts_stream(spark, src, out_dir, ckpt)
    got = _rows(spark.read.parquet(out_dir))
    want = _rows(windowed_event_counts_batch(spark, src))
    assert got, "stream emitted no closed windows"
    # every emitted window matches the batch result exactly
    for k, v in got.items():
        assert want[k] == v, k
    # only trailing windows (held by the final watermark) may be missing
    missing = set(want) - set(got)
    if missing:
        max_emitted = max(k[0] for k in got)
        assert all(k[0] >= max_emitted for k in missing)
