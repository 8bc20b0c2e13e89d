"""Min-label connected components must converge to the unique fixpoint on
graphs deeper than one hop (the sf0.01 data only exercises chains of 3),
and must do so in O(log diameter) rounds — chain-shaped near-dup clusters
(templated spam) would make a diameter-bounded loop the scale bottleneck."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from univer_ocr_spark.ops.dedup import _min_label_cc


def _sym(spark, pairs):
    p = spark.createDataFrame(pairs, "src long, dst long")
    return p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_min_label_cc_deep_chain(spark):
    # chain 0-1-2-...-9 (diameter 9), a triangle {20,21,22}, singleton 30
    chain = [(i, i + 1) for i in range(9)]
    tri = [(20, 21), (21, 22), (20, 22)]
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [20, 21, 22, 30]], "doc_id long"
    )
    labels, _ = _min_label_cc(nodes, _sym(spark, chain + tri))
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    want = {i: 0 for i in range(10)}
    want.update({20: 20, 21: 20, 22: 20, 30: 30})
    assert got == want


def test_min_label_cc_log_rounds_on_100_chain(spark):
    # a chain of 100 duplicates — the worst case for plain min-propagation
    # (diameter-many rounds); pointer jumping must converge in O(log n)
    n = 100
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = _sym(spark, [(i, i + 1) for i in range(n - 1)])
    labels, rounds = _min_label_cc(nodes, edges)
    assert rounds <= 2 * math.log2(n), rounds  # 13 for n=100; plain needs 99
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
