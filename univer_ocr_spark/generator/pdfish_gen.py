"""PDF-ish glyph-stream payload generator with by-construction goldens.

A textual stand-in for a PDF content stream: header ``%PDFISH <w> <h>`` then
one record per glyph ``g <ch> <x> <y> <wd> <ht>``, emitted in seeded-shuffled
order so the extractor must re-cluster. Layout mirrors what the reference's
line detection consumes: glyphs on shared baselines with disjoint vertical
bands, separated words, plus isolated header/footer runs marked non-main
(ref: the y/x interval-merge of lines, interpreter.py:494-502, and line
ordering, interpreter.py:85-102).

All coordinates are integers, so extraction rules are exact.
"""

from __future__ import annotations

from random import Random
from typing import List, Tuple

from univer_ocr_spark.constants import PDFISH_MAGIC
from univer_ocr_spark.generator.words import word
from univer_ocr_spark.spans import Span

Block = Tuple[int, int, str, bool, int, int]

PAGE_W = 612
PAGE_H = 792
GLYPH_W = 8
GLYPH_H = 10
LINE_PITCH = 20  # > GLYPH_H → bands disjoint
Y_FIRST = 120
WORD_GAP = 2 * GLYPH_W  # gap = GLYPH_W ≥ GLYPH_W/2 → space by rule


def _lay_line(rng: Random, y: int) -> Tuple[List[Tuple[str, int, int]], str]:
    """Lay out one text line at band [y, y+GLYPH_H); return (glyphs, text)."""
    glyphs: List[Tuple[str, int, int]] = []  # (ch, x, y)
    words = [word(rng) for _ in range(rng.randint(2, 6))]
    x = 40
    for wi, w in enumerate(words):
        for ch in w:
            glyphs.append((ch, x, y))
            x += GLYPH_W
        x += GLYPH_W  # word gap
    return glyphs, " ".join(words)


def generate_pdfish(rng: Random) -> Tuple[str, str, List[Span], List[Block]]:
    """Return (payload, gold_text, gold_spans, gold_blocks).

    ~25% of pages are stored rotated 90° clockwise (the scanned-sideways
    case the reference's rotation search handles, ref: interpreter.py:320-338
    W6 + orientation vote A9): every glyph box is rotated, the page header
    carries the swapped dimensions, and the expected text is unchanged — the
    extractor must detect the orientation (glyph aspect flips) and read
    bands along x instead of y.
    """
    # (ch, x, y, is_main, unit)
    glyphs: List[Tuple[str, int, int, bool, int]] = []
    gold_lines: List[str] = []

    if rng.random() < 0.5:  # header run (top 10% band → boilerplate)
        g, _ = _lay_line(rng, 10)
        glyphs.extend((ch, x, y, False, -1) for ch, x, y in g)

    n_lines = rng.randint(2, 7)
    for k in range(n_lines):
        g, text = _lay_line(rng, Y_FIRST + LINE_PITCH * k)
        glyphs.extend((ch, x, y, True, k) for ch, x, y in g)
        gold_lines.append(text)

    if rng.random() < 0.5:  # footer run (bottom 10% band → boilerplate)
        g, _ = _lay_line(rng, 770)
        glyphs.extend((ch, x, y, False, -2) for ch, x, y in g)

    order = list(range(len(glyphs)))
    rng.shuffle(order)
    rotated = rng.random() < 0.25

    if rotated:  # 90° CW: box [x,x+w)×[y,y+h) → [H-(y+h), H-y)×[x, x+w)
        header = f"{PDFISH_MAGIC} {PAGE_H} {PAGE_W}\n"
    else:
        header = f"{PDFISH_MAGIC} {PAGE_W} {PAGE_H}\n"
    parts = [header]
    pos = len(parts[0])
    # collect (unit, x, char_offset) for main glyphs; sort to reading order
    # (keys stay in PORTRAIT coordinates — reading order is invariant)
    main_offsets: List[Tuple[int, int, int]] = []
    line_extent: dict = {}  # unit -> [min_off, max_off]
    for gi in order:
        ch, x, y, is_main, unit = glyphs[gi]
        if rotated:
            rec = (
                f"g {ch} {PAGE_H - (y + GLYPH_H)} {x} {GLYPH_H} {GLYPH_W}\n"
            )
        else:
            rec = f"g {ch} {x} {y} {GLYPH_W} {GLYPH_H}\n"
        off = pos + 2  # offset of <ch> inside the record
        parts.append(rec)
        pos += len(rec)
        if is_main:
            main_offsets.append((unit, x, off))
        lo_hi = line_extent.setdefault(unit, [off, off])
        lo_hi[0] = min(lo_hi[0], off)
        lo_hi[1] = max(lo_hi[1], off)

    main_offsets.sort()
    spans: List[Span] = [(unit, off, off + 1) for unit, _x, off in main_offsets]

    blocks: List[Block] = []
    for unit in sorted(line_extent, key=lambda u: (u < 0, u)):
        lo, hi = line_extent[unit]
        kind = "line" if unit >= 0 else ("header" if unit == -1 else "footer")
        blocks.append((max(unit, 0), max(unit, 0), kind, unit >= 0, lo, hi + 1))

    return "".join(parts), "\n".join(gold_lines), spans, blocks
