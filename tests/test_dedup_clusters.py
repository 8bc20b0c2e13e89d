"""Min-label connected components must converge to the unique fixpoint on
graphs deeper than one hop (the sf0.01 data only exercises chains of 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from univer_ocr_spark.ops.dedup import _min_label_cc


def test_min_label_cc_deep_chain(spark):
    # chain 0-1-2-...-9 (diameter 9), a triangle {20,21,22}, singleton 30
    chain = [(i, i + 1) for i in range(9)]
    tri = [(20, 21), (21, 22), (20, 22)]
    pairs = chain + tri
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [20, 21, 22, 30]], "doc_id long"
    )
    p = spark.createDataFrame(pairs, "src long, dst long")
    edges = p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {
        r["doc_id"]: r["label"]
        for r in _min_label_cc(nodes, edges).collect()  # default: to fixpoint
    }
    want = {i: 0 for i in range(10)}
    want.update({20: 20, 21: 20, 22: 20, 30: 30})
    assert got == want
