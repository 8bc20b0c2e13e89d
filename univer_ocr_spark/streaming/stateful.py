"""Custom stateful streaming operator: per-user gap-based sessionization
with ``applyInPandasWithState`` — session state (merged session intervals +
event count) survives across micro-batches, and because the state is an
interval UNION the result is independent of micro-batch arrival order
(late files merge sessions instead of splitting them).

This is the streaming twin of ops/relational.q_sessionize_events (A6 — the
interval-merge semantics, ref: interpreter.py:494-502) and the designated
extension point for custom stateful operators the mission brief calls for.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from univer_ocr_spark.constants import SESSION_GAP_SECONDS

SESSION_GAP_US = SESSION_GAP_SECONDS * 1_000_000

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
# State is the per-user set of merged session INTERVALS (not just the last
# event time): interval-union state makes the result invariant to the order
# micro-batches arrive in — a late file landing between two already-seen
# sessions merges them instead of splitting/overcounting. State size is
# bounded by the user's session count, not event count.
STATE_SCHEMA = "starts array<long>, ends array<long>, n_events long"


def _update_sessions(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    starts, ends, n_events = state.get if state.exists else ([], [], 0)
    pts = []
    for pdf in pdfs:
        pts.extend(pdf["us"].tolist())
    n_events += len(pts)
    ivs = sorted(list(zip(starts, ends)) + [(p, p) for p in pts])
    merged: list = []
    for s, e in ivs:
        if merged and s - merged[-1][1] <= SESSION_GAP_US:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    state.update((
        [int(m[0]) for m in merged],
        [int(m[1]) for m in merged],
        int(n_events),
    ))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_sessions": len(merged), "n_events": n_events}]
    )


def stateful_sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "sessions",
) -> None:
    """Stream events (one file per micro-batch) → stateful sessionization →
    memory sink (update mode); blocks until drained. The final row per user
    (max n_events) is the complete sessionization."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(input_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # state must carry across batches
        .parquet(input_dir)
    )
    ev = src.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def final_session_counts(spark: SparkSession, query_name: str = "sessions") -> DataFrame:
    """Last update per user = the completed sessionization."""
    from pyspark.sql import Window as W

    t = spark.table(query_name)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        t.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_sessions", "n_events")
        .orderBy("user_id")
    )
