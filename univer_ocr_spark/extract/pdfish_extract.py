"""PDF-ish layout parsing: glyph clustering into lines via y-interval
merging, top-to-bottom line ordering, left-to-right glyph ordering, word-gap
spacing, header/footer margin stripping.

Direct analog of the reference's line geometry:
- y-interval union into line bands   ≈ interpreter.py:494-502 (A6);
- line ordering by reading direction ≈ interpreter.py:85-102 (O1);
- glyph ordering within a line       ≈ interpreter.py:95-96 (O2);
- margin stripping                   ≈ boilerplate masking (P4-flavored).

Integer arithmetic throughout — exact under any parallelism.
"""

from __future__ import annotations

from typing import List, Tuple

from univer_ocr_spark.constants import (
    PDFISH_MAGIC,
    PDFISH_MARGIN_DEN,
    PDFISH_MARGIN_NUM,
    PDFISH_SPACE_DEN,
    PDFISH_SPACE_NUM,
)
from univer_ocr_spark.spans import Span

Glyph = Tuple[int, int, int, int, int]  # (x, y, wd, ht, char_offset)


def parse_glyphs(payload: str) -> Tuple[int, int, List[Tuple[str, Glyph]]]:
    """Parse header + glyph records; returns (page_w, page_h, [(ch, glyph)])."""
    glyphs: List[Tuple[str, Glyph]] = []
    header_end = payload.find("\n")
    if header_end == -1:
        header_end = len(payload)
    header = payload[:header_end].split(" ")
    try:
        page_w, page_h = int(header[1]), int(header[2])
    except (IndexError, ValueError):
        return 0, 0, []  # unparseable page header → nothing extractable
    pos = header_end + 1
    n = len(payload)
    while pos < n:
        nl = payload.find("\n", pos)
        if nl == -1:
            nl = n
        line = payload[pos:nl]
        if line.startswith("g ") and len(line) >= 4:
            # record: g <ch> <x> <y> <wd> <ht>; <ch> is exactly one char.
            # Malformed records are skipped, not fatal — one bad byte in a
            # 10^12-turn table must not kill a task.
            ch = line[2]
            fields = line[4:].split(" ")
            if len(fields) == 4:
                try:
                    x, y, wd, ht = (int(f) for f in fields)
                except ValueError:
                    pass
                else:
                    glyphs.append((ch, (x, y, wd, ht, pos + 2)))
        pos = nl + 1
    return page_w, page_h, glyphs


def cluster_lines(
    glyphs: List[Tuple[str, Glyph]]
) -> List[Tuple[int, int, List[Tuple[str, Glyph]]]]:
    """Merge overlapping [y, y+ht) bands into lines (interval union, A6).

    Returns [(band_lo, band_hi, members)] ordered top-to-bottom.
    """
    ordered = sorted(glyphs, key=lambda g: (g[1][1], g[1][0]))
    lines: List[Tuple[int, int, List[Tuple[str, Glyph]]]] = []
    cur_lo = cur_hi = None
    cur: List[Tuple[str, Glyph]] = []
    for ch, g in ordered:
        y, ht = g[1], g[3]
        if cur_lo is None or y >= cur_hi:
            if cur:
                lines.append((cur_lo, cur_hi, cur))
            cur_lo, cur_hi, cur = y, y + ht, [(ch, g)]
        else:
            cur_hi = max(cur_hi, y + ht)
            cur.append((ch, g))
    if cur:
        lines.append((cur_lo, cur_hi, cur))
    return lines


def extract_pdfish(payload: str) -> Tuple[str, List[Span]]:
    """Return (extracted_text, spans).

    Per-payload tolerant parser. The Spark stage routes well-formed pdfish
    payloads through the Arrow-batch vectorized twin
    (extract/pdfish_batch.py) — NumPy only pays off across thousands of
    turns at once; per payload this pure-Python path is faster.
    """
    page_w, page_h, glyphs = parse_glyphs(payload)

    # Orientation vote (A9 analog, ref: interpreter.py:55-78): a 90°-rotated
    # page flips every glyph's aspect ratio. Portrait glyphs are taller than
    # wide; if the population is wider than tall, read bands along x.
    rotated = bool(glyphs) and (
        sum(g[1][2] for g in glyphs) > sum(g[1][3] for g in glyphs)
    )
    if rotated:
        # map to the portrait pipeline: band coord = -(x+wd) (so top line of
        # the original page, at max x after CW rotation, sorts first),
        # reading coord = y, reading extent = ht, band extent = wd
        glyphs = [
            (ch, (y, -(x + wd), ht, wd, off))
            for ch, (x, y, wd, ht, off) in glyphs
        ]
        dim = page_w
    else:
        dim = page_h

    spans: List[Span] = []
    unit_texts: List[str] = []
    unit = 0
    for band_lo, band_hi, members in cluster_lines(glyphs):
        # margin strip: drop if center < dim/10 or center > 9*dim/10
        # (integers); rotated band coords are negated → negate back
        c2 = -(band_lo + band_hi) if rotated else band_lo + band_hi
        if (
            PDFISH_MARGIN_DEN * c2 < 2 * PDFISH_MARGIN_NUM * dim
            or PDFISH_MARGIN_DEN * c2
            > 2 * (PDFISH_MARGIN_DEN - PDFISH_MARGIN_NUM) * dim
        ):
            continue
        members.sort(key=lambda g: g[1][0])  # by x
        chars: List[str] = []
        prev_x = prev_w = None
        for ch, (x, _y, wd, _ht, off) in members:
            if prev_x is not None:
                gap = x - (prev_x + prev_w)
                if gap >= 1 and PDFISH_SPACE_DEN * gap >= PDFISH_SPACE_NUM * prev_w:
                    chars.append(" ")
            chars.append(ch)
            spans.append((unit, off, off + 1))
            prev_x, prev_w = x, wd
        unit_texts.append("".join(chars))
        unit += 1
    return "\n".join(unit_texts), spans
