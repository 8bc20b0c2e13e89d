"""Width-parameterized SimHash (r4): the documented 96/128-bit extension is
a tested parameter, not a promise. Pins (a) width=64 equivalence with the
driver-gated pipeline, (b) planted near-dup recall at width=96, and (c) the
pigeonhole Hamming guarantee of the banded join."""

from __future__ import annotations

import pytest

from univer_ocr_spark.ops import dedup


@pytest.fixture(scope="module")
def simhash_docs_dir(spark, tmp_path_factory):
    """Docs with planted near-dup pairs: 5 exact duplicates (Hamming 0 at
    any width) and 5 pairs of 200-token docs differing in ONE token — a
    ~1% shingle change keeps the per-bit flip probability ~theta/pi ~ 2%,
    so signatures land within a few flipped bits of each other."""
    d = tmp_path_factory.mktemp("simhash_wide")
    rows = []
    doc_id = 0
    for i in range(5):  # exact duplicates
        text = " ".join(f"e{i}w{j}" for j in range(40))
        rows.append((doc_id, text))
        rows.append((doc_id + 1, text))
        doc_id += 2
    for i in range(5):  # one-token change in 200
        base = [f"s{i}w{j}" for j in range(200)]
        variant = list(base)
        variant[100] = f"s{i}X"
        rows.append((doc_id, " ".join(base)))
        rows.append((doc_id + 1, " ".join(variant)))
        doc_id += 2
    for i in range(20):  # unrelated filler
        rows.append((doc_id, " ".join(f"u{i}w{j}" for j in range(30))))
        doc_id += 1
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_width64_reproduces_production_signatures(spark, simhash_docs_dir):
    wide = {
        r["doc_id"]: (r["sim_0"], r["sim_1"])
        for r in dedup.simhash_signatures_wide(
            spark, simhash_docs_dir, width=64
        ).collect()
    }
    prod = {
        r["doc_id"]: (r["sim_lo"], r["sim_hi"])
        for r in dedup.simhash_signatures(spark, simhash_docs_dir).collect()
    }
    assert wide == prod


def test_width96_planted_pair_recall_and_hamming_exactness(
    spark, simhash_docs_dir
):
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    sigs = {
        r["doc_id"]: (r["sim_0"], r["sim_1"], r["sim_2"])
        for r in dedup.simhash_signatures_wide(
            spark, simhash_docs_dir, width=96
        ).collect()
    }
    assert all(0 <= h < 2**32 for s in sigs.values() for h in s)

    def brute_hamming(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b]))

    # planted pairs sit within the default budget (bands-1 = 5) at width 96:
    # exact dups at Hamming 0, the 1%-changed pairs within a few bits
    budget = 2 * (96 // 32) - 1
    close = {p for p in planted if brute_hamming(*p) <= budget}
    assert len(close) >= 7, sorted(brute_hamming(*p) for p in planted)

    pairs = dedup.simhash_neardup_pairs_wide(
        spark, simhash_docs_dir, width=96
    ).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    # exact recall for every pair within the pigeonhole budget
    assert close <= set(found)
    # reported Hamming equals brute-force over the signatures
    for (a, b), h in found.items():
        assert h == brute_hamming(a, b)
    # and nothing outside the budget is reported
    assert all(h <= budget for h in found.values())
