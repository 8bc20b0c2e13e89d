"""The vectorized batch dispatch must equal the per-row oracle dispatch —
including malformed payloads routed through the tolerant fallback."""

from __future__ import annotations

from random import Random

from univer_ocr_spark.extract import extract_payload, extract_payloads_batch
from univer_ocr_spark.extract.pdfish_batch import extract_pdfish_many
from univer_ocr_spark.extract.pdfish_extract import extract_pdfish
from univer_ocr_spark.generator.pdfish_gen import generate_pdfish
from univer_ocr_spark.generator.transcripts import build_turn, conv_id_of

MALFORMED = [
    "",
    "%PDFISH oops",
    "%PDFISH 612 792",
    "%PDFISH 612 792\n",
    "%PDFISH 612 792\ng X 10\njunk\ng a 100 400 8 10",
    "%PDFISH 612 792\ng a 100 400 8 10\ng b 1x0 400 8 10",  # non-int field
    "%PDFISH 612 792\ng a 100 -400 8 10",  # negative y
    "%PDFISH 612 792\ng  a 100 400 8 10",  # double space
    "plain text",
    # ADVICE r01 regressions: >int64 field must not raise OverflowError;
    # near-int64 coords must not wrap the pid*big band keying and merge
    # glyphs across payloads
    "%PDFISH 100 200\ng a 1 2 3 99999999999999999999999999\n",
    f"%PDFISH 100 200\ng b 1 {2**62} 3 4\n",
    f"%PDFISH 100 200\ng c {2**61} 400 8 10\n",
]


def test_batch_equals_per_row_mixed():
    texts = [
        build_turn(conv_id_of(c), t)["text"] for c in range(60) for t in range(4)
    ] + MALFORMED
    batch = extract_payloads_batch(texts)
    for i, t in enumerate(texts):
        assert batch[i] == extract_payload(t or ""), f"row {i}"


def test_pdfish_batch_equals_slow_path():
    payloads = [generate_pdfish(Random(s))[0] for s in range(200)] + MALFORMED
    res = extract_pdfish_many(payloads)
    for i, p in enumerate(payloads):
        assert res[i] == extract_pdfish(p), f"payload {i}"
