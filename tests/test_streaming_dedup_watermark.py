"""Watermarked streaming dedup: state is bounded to the event-time horizon.

Asserts the full contract: (a) a duplicate within the horizon is
suppressed across micro-batches, (b) a duplicate arriving AFTER the
watermark reclaimed its original's state is re-emitted (the documented
miss that bounds state), (c) never-duplicated rows pass through once."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    )


def test_watermarked_dedup_bounds_state(spark, tmp_path):
    from univer_ocr_spark.streaming.dedup_stream import dedup_stream_watermarked

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    src = str(tmp_path / "src")

    # batch 1: originals A (fp "alpha") and B (fp "beta")
    b1 = [(1, "alpha", t0), (2, "beta", t0)]
    # batch 2: dup of A 5 min later — inside the 10-min horizon → suppressed
    b2 = [(10, "alpha", t0 + 5 * m)]
    # batch 3: fresh C far in the future — advances the watermark past
    # beta's horizon at batch end
    b3 = [(3, "gamma", t0 + 180 * m)]
    # batch 4: state CLEANUP runs at each batch's end with the advanced
    # watermark — beta's entry (expiry t0+10m << t0+170m) is reclaimed here
    b4 = [(4, "delta", t0 + 181 * m)]
    # batch 5: dup of B beyond the horizon → re-emitted (documented miss)
    b5 = [(11, "beta", t0 + 182 * m)]

    for batch in (b1, b2, b3, b4, b5):
        _rows(spark, batch).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes: file order = trigger order

    dedup_stream_watermarked(spark, src, horizon="10 minutes",
                             query_name="dedup_wm_t")
    got = [
        (r["doc_id"], r["text"])
        for r in spark.table("dedup_wm_t").orderBy("doc_id").collect()
    ]
    # 1=alpha kept, 2=beta kept, 10=alpha suppressed (within horizon),
    # 3/4 fresh kept, 11=beta re-emitted (original's state was reclaimed)
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma"),
                   (4, "delta"), (11, "beta")]
