"""All four storage orientations and two-column reading order must decode
identically in the slow and batch paths (W6/A9 completeness, ref 4-way vote
interpreter.py:55-82; column/paragraph order interpreter.py:133-171)."""

from __future__ import annotations

from univer_ocr_spark.extract.pdfish_batch import extract_pdfish_many
from univer_ocr_spark.extract.pdfish_extract import extract_pdfish
from univer_ocr_spark.generator.pdfish_gen import PAGE_H, PAGE_W, _rotate_box
from univer_ocr_spark.spans import validate_spans

# two-column page in portrait coords: col1 lines "ab"/"cd", col2 "ef"/"gh",
# header run "zz" in the top margin (must strip in every orientation)
GLYPHS = [
    ("z", 40, 10), ("z", 48, 10),          # header (margin)
    ("a", 40, 120), ("b", 48, 120),        # col1 line 1
    ("c", 40, 140), ("d", 48, 140),        # col1 line 2
    ("e", 300, 120), ("f", 308, 120),      # col2 line 1 (same bands as col1)
    ("g", 300, 140), ("h", 308, 140),      # col2 line 2
]
WANT = "ab\ncd\nef\ngh"


def _payload(orient: int) -> str:
    if orient in (1, 3):
        header = f"%PDFISH {PAGE_H} {PAGE_W}\n"
    else:
        header = f"%PDFISH {PAGE_W} {PAGE_H}\n"
    recs = []
    for ch, x, y in GLYPHS:
        sx, sy, sw, sh = _rotate_box(orient, x, y, 8, 10)
        recs.append(f"g {ch} {sx} {sy} {sw} {sh}\n")
    recs.reverse()  # force re-sorting
    return header + "".join(recs)


def test_long_doc_multi_column_roundtrip():
    """Documents longer than two columns' capacity must wrap into more
    columns instead of drifting below the page middle (where the 180° mass
    vote would flip them) — review finding r02."""
    from univer_ocr_spark.ops.extract_docs import _pdfish_columns_payload

    words = [f"w{i:03d}" for i in range(180)]
    text = " ".join(words)
    payload = _pdfish_columns_payload(7, text)
    got, spans = extract_pdfish(payload)
    assert got.replace("\n", " ") == text
    assert got.count("\n") + 1 == 60  # ceil(180/3) lines
    # the batch path (what extract_stage actually runs) must agree
    assert extract_pdfish_many([payload])[0] == (got, spans)


def test_four_orientations_two_columns():
    payloads = [_payload(o) for o in range(4)]
    batch = extract_pdfish_many(payloads)
    for o, p in enumerate(payloads):
        text, spans = extract_pdfish(p)
        assert text == WANT, f"orient={o}: {text!r}"
        validate_spans(p, spans)
        assert batch[o] == (text, spans), f"batch mismatch orient={o}"
        # 8 main glyphs → 8 single-char spans over units 0..3
        assert [s[0] for s in spans] == [0, 0, 1, 1, 2, 2, 3, 3]
