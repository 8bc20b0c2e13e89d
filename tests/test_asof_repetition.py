"""Edge-case pins for the r5 operators.

``q_asof_join``: the carry-forward window plan must agree with DuckDB's
native ASOF JOIN on the cases the sf0.01 table may never exercise —
equal-timestamp view/click (>= semantics), equal-timestamp view/view
(max-event_id tie-break), clicks with no prior view (dropped), and a
hot user (the plan exists because join-then-rank goes quadratic there).

``doc_repetition_stats``: the HOF run-length mode count and 2-gram
dedup against hand-computed values, including empty/whitespace-only and
single-token docs (no 2-grams).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from univer_ocr_spark.ops import relational, textstats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _us(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def tie_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("asof_events")
    rows = [
        # user 1: view at the click's exact ts -> qualifies (>=)
        (1, _us(10.0), 1, "view", 0.0, "{}"),
        (2, _us(10.0), 1, "click", 0.0, "{}"),
        # user 2: two views at the SAME ts -> max event_id (4) wins
        (3, _us(5.0), 2, "view", 0.0, "{}"),
        (4, _us(5.0), 2, "view", 0.0, "{}"),
        (5, _us(6.0), 2, "click", 0.0, "{}"),
        # user 3: click with NO prior view -> dropped; later click pairs
        (6, _us(1.0), 3, "click", 0.0, "{}"),
        (7, _us(2.0), 3, "view", 0.0, "{}"),
        (8, _us(3.0), 3, "click", 0.0, "{}"),
        # user 4 is hot: 50 interleaved views/clicks
    ]
    eid = 100
    for i in range(50):
        rows.append((eid, _us(100.0 + i), 4, "view" if i % 2 == 0 else "click", 0.0, "{}"))
        eid += 1
    # other event types must be ignored
    rows.append((900, _us(0.5), 1, "error", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_asof_tie_semantics(spark, tie_events_dir):
    got = {
        r["click_id"]: (r["view_id"], r["lag_usec"])
        for r in relational.q_asof_join(spark, tie_events_dir).collect()
    }
    assert got[2] == (1, 0)          # equal-ts view qualifies, lag 0
    assert got[5] == (4, 1_000_000)  # max event_id among equal-ts views
    assert 6 not in got              # no prior view -> dropped
    assert got[8] == (7, 1_000_000)
    # hot user: every click pairs with the view 1s before it
    for i in range(1, 50, 2):
        assert got[100 + i] == (100 + i - 1, 1_000_000)


def test_asof_matches_duckdb_native(spark, tie_events_dir):
    spark_rows = sorted(
        (r["user_id"], r["click_id"], r["view_id"], r["lag_usec"])
        for r in relational.q_asof_join(spark, tie_events_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tie_events_dir}/events.parquet/*.parquet')"
    )
    oracle_rows = sorted(tuple(r) for r in con.execute(relational.Q_ASOF_SQL).fetchall())
    assert spark_rows == oracle_rows


@pytest.fixture(scope="module")
def rep_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rep_docs")
    rows = [
        (0, "a b a b a", "en", "s", 9),       # mode 'a' x3; 2-grams: ab,ba,ab,ba -> 2 distinct
        (1, "x x x x", "en", "s", 7),          # fully repeated
        (2, "w1 w2 w3", "en", "s", 8),         # all distinct
        (3, "", "en", "s", 0),                 # empty
        (4, "   ", "en", "s", 3),              # whitespace-only
        (5, "solo", "en", "s", 4),             # one token, no 2-grams
        (6, "A a A", "en", "s", 5),            # case-folded: mode 3
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_repetition_stats_hand_values(spark, rep_docs_dir):
    got = {
        r["doc_id"]: (r["n_tokens"], r["top_token_count"], r["n_2grams"], r["n_distinct_2grams"])
        for r in textstats.doc_repetition_stats(spark, rep_docs_dir).collect()
    }
    assert got[0] == (5, 3, 4, 2)
    assert got[1] == (4, 4, 3, 1)
    assert got[2] == (3, 1, 2, 2)
    assert got[3] == (0, 0, 0, 0)
    assert got[4] == (0, 0, 0, 0)
    assert got[5] == (1, 1, 0, 0)
    assert got[6] == (3, 3, 2, 1)


def test_repetition_stats_matches_duckdb(spark, rep_docs_dir):
    spark_rows = sorted(tuple(r) for r in textstats.doc_repetition_stats(spark, rep_docs_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{rep_docs_dir}/documents.parquet/*.parquet')"
    )
    oracle_rows = sorted(tuple(r) for r in con.execute(textstats.DOC_REPETITION_SQL).fetchall())
    assert spark_rows == oracle_rows
