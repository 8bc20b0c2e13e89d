"""Focused invariants for the r6 performance restructures (OPTIMIZATION_r06.md):

1. The 8-bit compressed sketch prefilter admits a SUPERSET of the exact
   >= MIN_EST_MATCHES survivors (equal 60-bit components stay equal mod
   2^8), and the two-stage cascade's final survivor set EQUALS the
   single-stage exact filter's set — the property that makes the cheap
   stage-1 pass semantics-free.
2. Bucket pair generation (groupBy key + array_sort(collect_list) +
   combination explode) emits exactly the multiset of doc_a < doc_b pairs
   the former self-join produced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from univer_ocr_spark.ops import dedup

SF_DIR = "/root/testdata/sf0.01"


def _survivor_sets(spark):
    sigs = dedup._packed_sigs(
        dedup._exploded_shingles(spark, SF_DIR, distinct=False)
    )
    cand = dedup._lsh_candidates_from_sigs(sigs, distinct=False)
    csig = F.transform("sigs", lambda s: ((s % 256) - 128).cast("tinyint"))
    csigs = sigs.select("doc_id", csig.alias("cs"))
    ca = csigs.select(F.col("doc_id").alias("doc_a"), F.col("cs").alias("a_cs"))
    cb = csigs.select(F.col("doc_id").alias("doc_b"), F.col("cs").alias("b_cs"))
    est_c = F.size(
        F.filter(F.zip_with("a_cs", "b_cs", lambda x, y: x == y), lambda m: m)
    )
    pre = (
        cand.join(ca, "doc_a").join(cb, "doc_b")
        .filter(est_c >= dedup.MIN_EST_MATCHES)
        .select("doc_a", "doc_b")
        .distinct()
    )
    est = F.size(
        F.filter(F.zip_with("a_sigs", "b_sigs", lambda x, y: x == y), lambda m: m)
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sigs").alias("a_sigs"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sigs").alias("b_sigs"))
    exact = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(est >= dedup.MIN_EST_MATCHES)
        .select("doc_a", "doc_b")
        .distinct()
    )
    cascade = (
        pre.join(sa, "doc_a").join(sb, "doc_b")
        .filter(est >= dedup.MIN_EST_MATCHES)
        .select("doc_a", "doc_b")
        .distinct()
    )
    rows = lambda df: {(r.doc_a, r.doc_b) for r in df.collect()}
    return rows(pre), rows(exact), rows(cascade)


def test_compressed_prefilter_superset_and_cascade_equality(spark):
    pre, exact, cascade = _survivor_sets(spark)
    assert exact, "corpus must contain sketch-filter survivors"
    # stage 1 is a necessary condition: no exact survivor is lost
    assert exact <= pre
    # the full cascade reproduces the single-stage exact semantics
    assert cascade == exact


def test_bucket_pair_generation_matches_self_join(spark):
    # synthetic buckets incl. a singleton (emits nothing), a pair, and a
    # 4-doc bucket (emits all 6 combinations), with unsorted insert order
    rows = [
        ("k1", 5), ("k1", 2), ("k1", 9), ("k1", 7),
        ("k2", 3), ("k2", 1),
        ("k3", 4),
    ]
    df = spark.createDataFrame(rows, ["key", "doc_id"])
    l, r = df.alias("l"), df.alias("r")
    joined = (
        l.join(r, (F.col("l.key") == F.col("r.key"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
    )
    buckets = (
        df.groupBy("key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    bucketed = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("ids") - 1),
                    lambda i: F.transform(
                        F.slice(F.col("ids"), i + 1, F.size("ids")),
                        lambda x: F.struct(
                            F.get(F.col("ids"), i - 1).alias("doc_a"),
                            x.alias("doc_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    a = sorted(map(tuple, joined.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b and len(a) == 1 + 6
