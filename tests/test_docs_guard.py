"""The markup by-construction oracles guard against doc text the extractor
would TRANSFORM (fence-start, ESC, BLANK, Cyrillic confusables, envelope
shape): both engines must exclude exactly the same docs, so parity holds
even on hostile regenerated data (ADVICE r01)."""

from __future__ import annotations

import duckdb
import pandas as pd

from univer_ocr_spark.ops.extract_docs import (
    EXTRACT_MARKUP_COLLAPSE_SQL,
    EXTRACT_MARKUP_DOCS_SQL,
    extract_markup_collapse_docs,
    extract_markup_docs,
)

HAZARD_DOCS = [
    (0, "plain safe text"),
    (1, "```starts with a fence"),
    (2, "has \x1b[31man ansi\x1b[0m run"),
    (3, "blank ␀ sentinel inside"),
    (4, "latin a then cyrillic а adjacent"),
    (5, "Cyrillic о alone"),
    (6, '{"stdout": "envelope shaped"}'),
    (7, "multi\nline\ntext stays safe"),
    (8, "\x1b[2Kstatus-prefixed line"),
    (9, "safe with punctuation !#$%"),
]


def test_markup_guards_two_sided(spark, tmp_path):
    pdf = pd.DataFrame(HAZARD_DOCS, columns=["doc_id", "text"])
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for fn, sql in (
        (extract_markup_docs, EXTRACT_MARKUP_DOCS_SQL),
        (extract_markup_collapse_docs, EXTRACT_MARKUP_COLLAPSE_SQL),
    ):
        got = {
            (r["doc_id"], r["extracted_text"]) for r in fn(spark, sf_dir).collect()
        }
        want = set(map(tuple, con.execute(sql).fetchall()))
        assert got == want, fn.__name__
        kept_ids = {i for i, _ in got}
        assert kept_ids == {0, 7, 9}, fn.__name__  # only the safe docs
