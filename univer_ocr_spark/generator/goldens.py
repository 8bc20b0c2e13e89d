"""Materialized per-turn goldens: the DuckDB-readable ground truth for the
flagship ``transcripts_extract`` oracle and the derived aggregate oracles.

The reference's correctness gate IS its goldens (its oracle-decode route,
ref: web_app/views/main.py:88-99 — the fixture text is the check); here the
same idea is expressed as a parquet table the driver's DuckDB side can read:
one row per (conv_id, turn_idx) with the expected extraction digest
(md5 of text, canonical span string, unit/span/char counts).

Everything is a pure function of (GLOBAL_SEED, params, generator code), so
the table is cached in /tmp keyed by a hash of the generator sources +
params — a generator change self-invalidates the cache AND the oracles
derived from it (no more hand-maintained constant literals).
"""

from __future__ import annotations

import glob
import hashlib
import os
from typing import Dict, Iterator

from univer_ocr_spark.constants import GLOBAL_SEED
from univer_ocr_spark.generator.transcripts import conv_id_of, conv_size, build_turn

GOLDEN_DIGEST_COLS = (
    "conv_id", "turn_idx", "kind", "n_units", "n_spans", "n_chars",
    "text_md5", "spans_str",
)


def generator_fingerprint() -> str:
    """Hash of generator sources + constants: changed generation logic must
    invalidate any cached table derived from it."""
    h = hashlib.blake2b(digest_size=4)
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(pkg, "generator", "*.py")))
    files.append(os.path.join(pkg, "constants.py"))
    for f in files:
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def spans_canonical(spans) -> str:
    """Canonical order-preserving span encoding, identical on both engines:
    'unit:start:end' joined by ';'. (Comparing the raw array<struct> would
    tie the oracle to Spark's struct-to-string rendering.)"""
    return ";".join(f"{u}:{s}:{e}" for (u, s, e) in spans)


def golden_digest_rows(n_convs: int, mega_conv_count: int = 0,
                       mega_conv_size: int = 1000,
                       global_seed: int = GLOBAL_SEED) -> Iterator[Dict]:
    for idx in range(n_convs):
        cid = conv_id_of(idx)
        for t in range(conv_size(idx, mega_conv_count, mega_conv_size,
                                 global_seed)):
            row = build_turn(cid, t, global_seed)
            spans = [(s["unit"], s["start"], s["end"]) for s in row["gold_spans"]]
            yield {
                "conv_id": cid,
                "turn_idx": t,
                "kind": row["payload_kind"],
                # n_units exactly as the extraction stage counts it
                # (spark/pipeline.py extract_stage): last unit id + 1
                "n_units": (spans[-1][0] + 1) if spans else 0,
                "n_spans": len(spans),
                "n_chars": len(row["gold_text"]),
                "text_md5": hashlib.md5(
                    row["gold_text"].encode("utf-8")
                ).hexdigest(),
                "spans_str": spans_canonical(spans),
            }


def goldens_parquet(n_convs: int = 60, mega_conv_count: int = 1,
                    mega_conv_size: int = 200,
                    global_seed: int = GLOBAL_SEED) -> str:
    """Materialize (once, atomically) the golden digest table and return its
    path. Pure-Python + pyarrow — no Spark session needed, so the DuckDB
    oracle side can trigger it too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    key = f"{generator_fingerprint()}_{n_convs}_{mega_conv_count}_{mega_conv_size}_{global_seed}"
    path = f"/tmp/univer_goldens_{key}.parquet"
    if os.path.exists(path):
        return path
    rows = list(golden_digest_rows(n_convs, mega_conv_count, mega_conv_size,
                                   global_seed))
    table = pa.table(
        {c: [r[c] for r in rows] for c in GOLDEN_DIGEST_COLS},
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int64()),
                ("kind", pa.string()),
                ("n_units", pa.int64()),
                ("n_spans", pa.int64()),
                ("n_chars", pa.int64()),
                ("text_md5", pa.string()),
                ("spans_str", pa.string()),
            ]
        ),
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: concurrent writers converge
    return path
