"""Dump .explain("formatted") for the r6-touched queries into
plans/r06/<query>_<tag>.txt  (tag = before|after, argv[1]).

Usage: python tools/dump_plans_r06.py before [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1]
    from univer_ocr_spark.ops import dedup
    from univer_ocr_spark.spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    targets = {
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "lsh_verified_pairs": dedup.lsh_verified_pairs,
        "neardup_clusters": dedup.neardup_clusters,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
    }
    want = sys.argv[2:] or list(targets)
    os.makedirs("plans/r06", exist_ok=True)
    for name in want:
        df = targets[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        import re

        n_exch = len(re.findall(r"\bExchange\b", buf.getvalue()))
        print(f"{name}: Exchanges={n_exch} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
