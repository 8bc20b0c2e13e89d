"""The extraction pipeline: Arrow-batched per-turn extraction + explicit
partitioning / skew salting.

Spark restatement of the reference's predict path (ref: my_model/model.py:489-529
ModelSystem component chain; my_model/predict.py:34-66): the context dict
becomes DataFrame columns, the per-paragraph/line worker pools
(ref: interpreter.py:350-418) become Spark tasks over hash partitions, and
the nested text result becomes (extracted_text, spans) columns.

Scale design (SURVEY.md X14 — the one thing the reference lacks):
- extraction is row-local, so the only shuffle in the hot path is the single
  optional ``repartition`` that right-sizes tasks;
- per-conversation aggregates use two-phase (salted partial → final) plans so
  a 10^4-turn mega-conversation cannot serialize one reducer;
- output ordering is by (conv_id, turn_idx) *columns*, never partition
  layout, so salting can't break the ordering contract.
"""

from __future__ import annotations

from typing import Iterator, List

from pyspark.sql import DataFrame, functions as F, types as T

from univer_ocr_spark import EXTRACTION_VERSION
from univer_ocr_spark.extract import extract_payloads_batch

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("unit", T.IntegerType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

EXTRA_FIELDS = [
    T.StructField("extracted_text", T.StringType()),
    T.StructField("spans", SPAN_TYPE),
    T.StructField("kind", T.StringType()),
    T.StructField("n_units", T.IntegerType()),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("n_chars", T.IntegerType()),
]


def extract_stage(df: DataFrame, payload_col: str = "text",
                  drop_payload: bool = False) -> DataFrame:
    """Append extraction columns via one Arrow-batched ``mapInPandas`` stage.

    One stage, no shuffle: Catalyst keeps upstream filters/pruning below it,
    and everything downstream sees plain columns.

    ``drop_payload=True`` excludes the raw payload from the OUTPUT batch —
    the extracted table should not duplicate input payloads, and at KB-scale
    payloads this halves the Python→JVM Arrow traffic (mapInPandas cannot be
    column-pruned from above).
    """
    import pandas as pd

    out_fields = [f for f in df.schema.fields
                  if not (drop_payload and f.name == payload_col)]
    out_schema = T.StructType(out_fields + EXTRA_FIELDS)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts: List[str] = pdf[payload_col].tolist()
            ext, spans_col, kinds, n_units, n_spans, n_chars = [], [], [], [], [], []
            for text, spans, kind in extract_payloads_batch(texts):
                ext.append(text)
                # r6: hand Arrow the raw (unit, start, end) tuples — pyarrow
                # maps positional tuples onto the declared struct fields, so
                # the per-span dict build (~30% of the headline's span
                # serialization cost at 1M turns) disappears; values are
                # byte-identical (goldens + stream==batch tests pin this)
                spans_col.append(spans)
                kinds.append(kind)
                n_units.append(spans[-1][0] + 1 if spans else 0)
                n_spans.append(len(spans))
                n_chars.append(len(text))
            if drop_payload:
                pdf = pdf.drop(columns=[payload_col])
            yield pdf.assign(
                extracted_text=ext,
                spans=spans_col,
                kind=kinds,
                n_units=pd.array(n_units, dtype="int32"),
                n_spans=pd.array(n_spans, dtype="int32"),
                n_chars=pd.array(n_chars, dtype="int32"),
            )

    return df.mapInPandas(fn, schema=out_schema)


def detect_skewed_convs(df: DataFrame, threshold: int = 10000) -> List[str]:
    """Cheap pre-pass: conv_ids with more than ``threshold`` turns.

    At 10^12 turns this is a single map-side-combined groupBy on one string
    key whose result (the skew list) is tiny by definition — safe to collect
    and broadcast.
    """
    rows = (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select("conv_id")
        .collect()
    )
    return [r["conv_id"] for r in rows]


def with_salt(df: DataFrame, skewed: List[str], n_salt: int = 16) -> DataFrame:
    """Add a ``salt`` column: 0 for normal convs, turn_idx-derived for
    mega-conversations, so a later repartition/groupBy on (conv_id, salt)
    spreads each mega-conv over ``n_salt`` reducers (SURVEY.md X14)."""
    if not skewed:
        return df.withColumn("salt", F.lit(0))
    skew_col = F.col("conv_id").isin(skewed)
    return df.withColumn(
        "salt",
        F.when(skew_col, F.pmod(F.col("turn_idx"), F.lit(n_salt))).otherwise(F.lit(0)),
    )


def run_extraction(
    df: DataFrame,
    partitions: int | None = None,
    salt_threshold: int = 10000,
    n_salt: int = 16,
    drop_payload: bool = False,
) -> DataFrame:
    """Full pipeline: (optional) skew-aware repartition → extraction stage.

    ``partitions=None`` keeps the input partitioning (no shuffle at all —
    the right call when the source is already well-partitioned parquet).
    """
    if partitions:
        skewed = detect_skewed_convs(df, salt_threshold)
        df = (
            with_salt(df, skewed, n_salt)
            .repartition(partitions, "conv_id", "salt")
            .drop("salt")
            # stable-ordering invariant (O5 / north_rule): turns of a conv
            # arrive in turn_idx order within each partition; the OUTPUT
            # contract remains the (conv_id, turn_idx) columns, so salting
            # can never break ordering
            .sortWithinPartitions("conv_id", "turn_idx")
        )
    out = extract_stage(df, drop_payload=drop_payload)
    return out.withColumn("extraction_version", F.lit(EXTRACTION_VERSION))


def conv_stats(extracted: DataFrame, n_salt: int = 16) -> DataFrame:
    """Per-conversation rollup with a skew-proof two-phase aggregate:
    partial agg on (conv_id, salt) → final agg on conv_id. Functionally the
    map-side combine Spark already does for sums — made explicit so a single
    hot reducer key is impossible even with combiner-hostile aggregates."""
    salted = extracted.withColumn("salt", F.pmod(F.col("turn_idx"), F.lit(n_salt)))
    partial = salted.groupBy("conv_id", "salt").agg(
        F.count(F.lit(1)).alias("p_turns"),
        F.sum("n_chars").alias("p_chars"),
        F.sum("n_spans").alias("p_spans"),
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.sum("p_turns").alias("n_turns"),
            F.sum("p_chars").alias("total_chars"),
            F.sum("p_spans").alias("total_spans"),
        )
    )
