"""PDF-ish glyph-stream payload generator with by-construction goldens.

A textual stand-in for a PDF content stream: header ``%PDFISH <w> <h>`` then
one record per glyph ``g <ch> <x> <y> <wd> <ht>``, emitted in seeded-shuffled
order so the extractor must re-cluster. Layout mirrors what the reference's
line detection consumes: glyphs on shared baselines with disjoint vertical
bands, separated words, isolated header/footer runs marked non-main
(ref: the y/x interval-merge of lines, interpreter.py:494-502, and line
ordering, interpreter.py:85-102), plus two-column pages (the p_id
paragraph loop, interpreter.py:133-171) and all four storage orientations
(the 0/90/180/270 vote, interpreter.py:55-82).

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
TITLE_H = 16  # merged-overlap titles are SET LARGER than body glyphs: the
# height gap is what lets the extractor split a title sharing ONE x-run
# with a column line (2·ht > max+min with 16/10 → title class)
LINE_PITCH = 20  # > GLYPH_H → bands disjoint
Y_FIRST = 120
# two-column geometry: column 1 starts at x=40; narrow lines (≤3 short
# words) keep its x-projection below 40+26*8=248; column 2 starts at 330 —
# gutter ≥ 82 > 4*GLYPH_W=32, so the extractor's column rule always splits
COL2_X = 330


def _lay_line(
    rng: Random, y: int, x0: int = 40, words_lo: int = 2, words_hi: int = 6,
    word_hi: int = 10,
) -> Tuple[List[Tuple[str, int, int]], str]:
    """Lay out one text line at band [y, y+GLYPH_H); return (glyphs, text)."""
    glyphs: List[Tuple[str, int, int]] = []  # (ch, x, y)
    words = [word(rng, hi=word_hi) for _ in range(rng.randint(words_lo, words_hi))]
    x = x0
    for wi, w in enumerate(words):
        for ch in w:
            glyphs.append((ch, x, y))
            x += GLYPH_W
        x += GLYPH_W  # word gap
    return glyphs, " ".join(words)


def _rotate_box(orient: int, x: int, y: int, w: int, h: int):
    """Stored box for a page rotated ``orient``×90° clockwise."""
    if orient == 0:
        return x, y, w, h
    if orient == 1:  # 90° CW: top of page lands at high x
        return PAGE_H - (y + h), x, h, w
    if orient == 2:  # 180°
        return PAGE_W - (x + w), PAGE_H - (y + h), w, h
    return y, PAGE_W - (x + w), h, w  # 270° CW (= 90° CCW)


def generate_pdfish(rng: Random) -> Tuple[str, str, List[Span], List[Block]]:
    """Return (payload, gold_text, gold_spans, gold_blocks).

    ~50% of pages are stored rotated (90°/180°/270°, the scanned-sideways /
    upside-down cases of the reference's orientation vote+rotation search,
    ref: interpreter.py:55-82, :320-338): every glyph box is rotated, the
    page header carries the rotated dimensions, and the expected text is
    unchanged — the extractor must recover the orientation (aspect vote +
    content mass-center). ~25% of pages lay their body in two columns with
    a wide gutter; reading order is column-major (left column fully first).
    """
    two_col = rng.random() < 0.25

    # (ch, x, y, ht, is_main, unit)
    glyphs: List[Tuple[str, int, int, int, bool, int]] = []
    gold_lines: List[str] = []

    if two_col:
        # header/footer runs stay inside column 1's x-range so the gutter
        # is never bridged by BOILERPLATE; ~50% of two-column pages get a
        # full-width spanning TITLE across the gutter (the real-document
        # geometry the r3 spanning-block pre-pass exists for: without it
        # the title glues both columns into one and garbles reading order)
        if rng.random() < 0.5:
            g, _ = _lay_line(rng, 10, words_lo=2, words_hi=3, word_hi=6)
            glyphs.extend((ch, x, y, GLYPH_H, False, -1) for ch, x, y in g)
        unit = 0
        overlap = merged = False
        if rng.random() < 0.5:
            # Non-overlap: title band [85, 95) — below the top-margin strip
            # (center 90 is outside the top 10% of 792), above the body
            # (y >= 120), one x-run whose extent >= 372 > ceil(3/5 * 612) —
            # spanning by the integer rule, never splittable by the column
            # gap test.
            # Overlap variant (r4, ~40% of titled pages): title at y=100,
            # so its band [100, 110) OVERLAPS column 2's first line band
            # [108, 118) — the merged y-band holds a spanning run AND a
            # column run, exercising run-level spanning detection (the r3
            # degraded mode). Column 2 shifts to x=500 and its words cap at
            # 4 chars so the title run (x_end <= 451 with 4-char title
            # words) stays >= one column gap away from it.
            # Merged variant (r5, next 20% of titled pages): TALL title
            # (TITLE_H) at y=100 AND column 1 moved up to y=108 at the
            # title's own x-origin — title and column-1 line 1 share both
            # the merged y-band [100, 118) and ONE x-run, so only the
            # glyph-height split separates them (the r4 degraded mode);
            # column 2 at x=500 co-tenants the band as an x-disjoint run.
            r = rng.random()
            overlap, merged = r < 0.4, 0.4 <= r < 0.6
            title_y, title_word_hi = (100, 4) if (overlap or merged) else (85, 8)
            title_ht = TITLE_H if merged else GLYPH_H
            title_words: List[str] = []
            x = 40
            while x - 40 < 380:
                w = word(rng, hi=title_word_hi)
                title_words.append(w)
                for ch in w:
                    glyphs.append((ch, x, title_y, title_ht, True, 0))
                    x += GLYPH_W
                x += GLYPH_W
            gold_lines.append(" ".join(title_words))
            unit = 1
        if overlap:
            col_specs = ((40, Y_FIRST, 6), (500, 108, 4))
        elif merged:
            col_specs = ((40, 108, 4), (500, 108, 4))
        else:
            col_specs = ((40, Y_FIRST, 6), (COL2_X, Y_FIRST, 6))
        for x0, y0, whi in col_specs:
            n_lines = rng.randint(2, 4)
            for k in range(n_lines):
                g, text = _lay_line(
                    rng, y0 + LINE_PITCH * k, x0=x0,
                    words_lo=2, words_hi=3, word_hi=whi,
                )
                glyphs.extend((ch, x, y, GLYPH_H, True, unit) for ch, x, y in g)
                gold_lines.append(text)
                unit += 1
        if rng.random() < 0.5:
            g, _ = _lay_line(rng, 770, words_lo=2, words_hi=3, word_hi=6)
            glyphs.extend((ch, x, y, GLYPH_H, False, -2) for ch, x, y in g)
    else:
        if rng.random() < 0.5:  # header run (top 10% band → boilerplate)
            g, _ = _lay_line(rng, 10)
            glyphs.extend((ch, x, y, GLYPH_H, False, -1) for ch, x, y in g)
        n_lines = rng.randint(2, 7)
        for k in range(n_lines):
            g, text = _lay_line(rng, Y_FIRST + LINE_PITCH * k)
            glyphs.extend((ch, x, y, GLYPH_H, True, k) for ch, x, y in g)
            gold_lines.append(text)
        if rng.random() < 0.5:  # footer run (bottom 10% band → boilerplate)
            g, _ = _lay_line(rng, 770)
            glyphs.extend((ch, x, y, GLYPH_H, False, -2) for ch, x, y in g)

    order = list(range(len(glyphs)))
    rng.shuffle(order)
    orient = 0 if rng.random() < 0.5 else rng.randrange(1, 4)

    if orient in (1, 3):  # landscape storage: header carries swapped dims
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
        ch, x, y, ht, is_main, unit = glyphs[gi]
        sx, sy, sw, sh = _rotate_box(orient, x, y, GLYPH_W, ht)
        rec = f"g {ch} {sx} {sy} {sw} {sh}\n"
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
