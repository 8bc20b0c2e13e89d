"""PDF-ish layout parsing: 4-way orientation vote, x-gap column clustering,
glyph clustering into lines via y-interval merging, top-to-bottom line
ordering, left-to-right glyph ordering, word-gap spacing, header/footer
margin stripping.

Direct analog of the reference's line geometry:
- orientation vote (0°/90°/180°/270°)   ≈ interpreter.py:55-82 (A9) — aspect
  ratio separates portrait/landscape; content mass-center separates each
  pair (180° is aspect-identical to 0°, but body text sits top-heavy);
- column grouping above line detection  ≈ the per-paragraph p_id loop,
  interpreter.py:133-171 (2-D reading order);
- y-interval union into line bands      ≈ interpreter.py:494-502 (A6);
- line ordering by reading direction    ≈ interpreter.py:85-102 (O1);
- glyph ordering within a line          ≈ interpreter.py:95-96 (O2);
- margin stripping                      ≈ boilerplate masking (P4-flavored).

Integer arithmetic throughout — exact under any parallelism.

Spanning blocks (r3): a page-global y-band forming ONE x-run that covers
≥ 3/5 of the reading-axis extent (a title/abstract bridging the gutter) is
emitted as its own full-width block at its vertical position; column
clustering runs per REGION between spanning bands, so a spanning title can
no longer glue two columns together (the r2 documented degraded mode). The
reference handles the same geometry with per-component crops
(ref: interpreter.py:133-171, :303-308).

r4: spanning detection is RUN-level, not band-level — a y-band is first
segmented into x-runs (the column-gap rule), and any single run covering
≥ 3/5 of the reading extent emits as its own full-width block even when the
band also contains x-disjoint column lines (a title whose band OVERLAPS a
column line's band — the r3 documented degraded mode). The band's
non-spanning runs join the region BELOW the spanning block.

r5: a spanning run whose x-projection overlaps a column line in the SAME
x-run (the r4 documented degraded mode) is separated by GLYPH HEIGHT:
titles are set larger than body text, so a mixed-height spanning-sized run
splits at the height midpoint — the tall subset emits as the spanning
block (if it alone still spans and stays one x-run), the short glyphs
re-attach to the region below (_height_split). A mixed run whose tall
subset fails those conditions keeps the r4 whole-run behavior, so output
stays deterministic and loss-free in every case.
"""

from __future__ import annotations

from typing import List, Tuple

from univer_ocr_spark.constants import (
    PDFISH_COL_GAP_FACTOR,
    PDFISH_MAGIC,
    PDFISH_MARGIN_DEN,
    PDFISH_MARGIN_NUM,
    PDFISH_SPACE_DEN,
    PDFISH_SPACE_NUM,
    PDFISH_SPAN_DEN,
    PDFISH_SPAN_NUM,
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


def orient_glyphs(
    glyphs: List[Tuple[str, Glyph]], page_w: int, page_h: int
) -> Tuple[List[Tuple[str, Glyph]], int, bool]:
    """4-way orientation vote (A9 analog, ref: interpreter.py:55-82) and
    remap into upright reading coordinates.

    Vote: glyph aspect (Σwd vs Σht) separates portrait from landscape; the
    MAIN-content mass-center along the band axis separates 0° from 180° and
    90° from 270° (aspect alone cannot — body text is top-heavy, so a
    flipped page has its mass below the page middle). Margin-band glyphs
    are excluded from the mass vote: the top-10%/bottom-10% exclusion is
    mirror-symmetric, hence orientation-invariant, and without it a heavy
    footer run outweighs a short body and flips the vote.

    Returns ``(oriented, dim, neg, rdim)``: glyphs as
    (ch, (bx, by, bw, bh, off)) where bx/bw are reading-axis coord/extent
    and by/bh band-axis, ``dim`` the band-axis page extent for the margin
    rule, ``neg`` True when band coords were negated (margin centers
    un-negate with it), and ``rdim`` the READING-axis page extent (the
    spanning-block rule's denominator).
    """
    if not glyphs:
        return glyphs, page_h, False, page_w
    sw = sum(g[1][2] for g in glyphs)
    sh = sum(g[1][3] for g in glyphs)

    def _mass_above(axis: int, ext: int, dim: int) -> bool:
        """True if the non-margin mass-center sits BELOW the page middle
        (i.e. the stored page is flipped along this axis)."""
        tot = cnt = 0
        for _ch, g in glyphs:
            c2 = 2 * g[axis] + g[ext]
            if (
                PDFISH_MARGIN_DEN * c2 < 2 * PDFISH_MARGIN_NUM * dim
                or PDFISH_MARGIN_DEN * c2
                > 2 * (PDFISH_MARGIN_DEN - PDFISH_MARGIN_NUM) * dim
            ):
                continue  # margin glyph: symmetric → orientation-invariant
            tot += c2
            cnt += 1
        return cnt > 0 and tot > cnt * dim

    if sw > sh:  # landscape: stored 90° CW or 270° CW
        # 90° CW puts the original top at high stored x
        cw = _mass_above(0, 2, page_w)
        if cw:
            out = [
                (ch, (y, -(x + wd), ht, wd, off))
                for ch, (x, y, wd, ht, off) in glyphs
            ]
            return out, page_w, True, page_h
        out = [
            (ch, (-(y + ht), x, ht, wd, off))
            for ch, (x, y, wd, ht, off) in glyphs
        ]
        return out, page_w, False, page_h
    # portrait: 0° or 180° — flipped content mass sits below the middle
    flipped = _mass_above(1, 3, page_h)
    if flipped:
        out = [
            (ch, (-(x + wd), -(y + ht), wd, ht, off))
            for ch, (x, y, wd, ht, off) in glyphs
        ]
        return out, page_h, True, page_w
    return glyphs, page_h, False, page_w


def cluster_columns(
    glyphs: List[Tuple[str, Glyph]], thresh: int | None = None
) -> List[List[Tuple[str, Glyph]]]:
    """Group glyphs into columns by x-projection interval union with a gap
    threshold of COL_GAP_FACTOR × max reading extent (page-global when the
    caller passes ``thresh`` — per-region inputs must not shrink it).
    Columns are returned in reading order (left to right)."""
    if not glyphs:
        return []
    if thresh is None:
        thresh = PDFISH_COL_GAP_FACTOR * max(g[1][2] for g in glyphs)
    ordered = sorted(glyphs, key=lambda g: g[1][0])
    cols: List[List[Tuple[str, Glyph]]] = []
    cur_hi = None
    for ch, g in ordered:
        x, wd = g[0], g[2]
        if cur_hi is None or x >= cur_hi + thresh:
            cols.append([])
            cur_hi = x + wd
        else:
            cur_hi = max(cur_hi, x + wd)
        cols[-1].append((ch, g))
    return cols


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


def _run_is_spanning(run: List[Tuple[str, Glyph]], rdim: int) -> bool:
    """A single x-run (already gap-split by cluster_columns) is a spanning
    block iff it covers ≥ SPAN_NUM/SPAN_DEN of the reading-axis page
    extent. A column line fails the extent test; two parallel column lines
    are two runs and never reach here as one."""
    lo = min(g[0] for _ch, g in run)
    hi = max(g[0] + g[2] for _ch, g in run)
    return PDFISH_SPAN_DEN * (hi - lo) >= PDFISH_SPAN_NUM * rdim


def _height_split(
    run: List[Tuple[str, Glyph]], thresh: int, rdim: int
) -> Tuple[List[Tuple[str, Glyph]], List[Tuple[str, Glyph]]] | None:
    """Split a spanning-sized mixed-height x-run into (tall, short), or
    None when the run should stay whole.

    The r4 degraded mode: a full-width TITLE whose y-band overlaps a column
    line AND whose x-projection touches that line forms ONE x-run — extent
    alone cannot separate them. Glyph height can (r5): titles are set
    larger than body text, so partition the run at the height midpoint
    (2·ht > max+min, integer-exact; both classes are nonempty whenever two
    heights exist). The TALL subset is promoted to a spanning block only
    if it (a) still passes the extent test by itself and (b) remains a
    single x-run under the page's column-gap rule — dropping the short
    glyphs must not tear the title into gap-separated fragments, and the
    single-run invariant is what lets the batch twin treat every spanning
    segment as one column. The short glyphs re-attach to the region below,
    where column clustering re-segments them by the normal gap rule.
    Reference analog: per-component 2-D crops separate title from column
    line (ref: interpreter.py:133-171, :303-308)."""
    m = H = run[0][1][3]
    for _ch, g in run[1:]:
        ht = g[3]
        if ht < m:
            m = ht
        elif ht > H:
            H = ht
    if m == H:
        return None
    pivot = H + m
    tall = [(ch, g) for ch, g in run if 2 * g[3] > pivot]
    if not _run_is_spanning(tall, rdim) or len(cluster_columns(tall, thresh)) != 1:
        return None
    short = [(ch, g) for ch, g in run if 2 * g[3] <= pivot]
    return tall, short


def extract_pdfish(payload: str) -> Tuple[str, List[Span]]:
    """Return (extracted_text, spans).

    Per-payload tolerant parser. The Spark stage routes well-formed pdfish
    payloads through the Arrow-batch vectorized twin
    (extract/pdfish_batch.py) — NumPy only pays off across thousands of
    turns at once; per payload this pure-Python path is faster.

    Reading order: page-global y-bands are walked top-to-bottom; spanning
    bands emit in place as full-width blocks, and the non-spanning bands
    BETWEEN them form regions that are column-clustered independently —
    region columns left-to-right, lines top-to-bottom within each column.
    """
    page_w, page_h, glyphs = parse_glyphs(payload)
    oriented, dim, neg, rdim = orient_glyphs(glyphs, page_w, page_h)
    if not oriented:
        return "", []
    thresh = PDFISH_COL_GAP_FACTOR * max(g[1][2] for g in oriented)

    spans: List[Span] = []
    unit_texts: List[str] = []
    unit = 0

    def emit_line(band_lo: int, band_hi: int,
                  members: List[Tuple[str, Glyph]]) -> None:
        nonlocal unit
        # margin strip: drop if center < dim/10 or center > 9*dim/10
        # (integers); negated band coords un-negate for the center
        c2 = -(band_lo + band_hi) if neg else band_lo + band_hi
        if (
            PDFISH_MARGIN_DEN * c2 < 2 * PDFISH_MARGIN_NUM * dim
            or PDFISH_MARGIN_DEN * c2
            > 2 * (PDFISH_MARGIN_DEN - PDFISH_MARGIN_NUM) * dim
        ):
            return
        members.sort(key=lambda g: g[1][0])  # by reading coord
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

    def flush_region(region: List[Tuple[str, Glyph]]) -> None:
        for col in cluster_columns(region, thresh):
            for band_lo, band_hi, members in cluster_lines(col):
                emit_line(band_lo, band_hi, members)

    # classify bands, then rebuild each region's glyph list in ORIGINAL
    # input order (keyed by the unique char offset): column clustering
    # breaks ties of equal reading-coordinate by encounter order, and the
    # batch twin's stable sorts see input order — zero-extent degenerate
    # glyphs (fuzz) make that tie order observable
    bands = cluster_lines(oriented)
    span_bands: List[List[Tuple[str, Glyph]]] = []  # spanning runs, in order
    region_of = {}
    for _band_lo, _band_hi, members in bands:
        # r4: classify per x-RUN, so a spanning title whose y-band overlaps
        # a column line still emits as its own block; the band's
        # non-spanning runs join the region BELOW it (len(span_bands) is
        # taken AFTER appending this band's spanning runs). Spanning-run
        # y-bounds are recomputed from the run's own glyphs — for a
        # single-run band that equals the band bounds, so the r3 behavior
        # is unchanged there.
        # r5: a spanning-sized run with MIXED glyph heights (title and
        # column line in the SAME x-run — the r4 documented degraded mode)
        # splits at the height midpoint: the tall subset emits as the
        # spanning block, the short glyphs demote to the region below
        # (_height_split for the promotion conditions).
        runs = cluster_columns(members, thresh)
        demoted: List[Tuple[str, Glyph]] = []
        for run in runs:
            if _run_is_spanning(run, rdim):
                split = _height_split(run, thresh, rdim)
                if split is not None:
                    tall, short = split
                    span_bands.append(tall)
                    demoted.extend(short)
                else:
                    span_bands.append(run)
            else:
                demoted.extend(run)
        for _ch, g in demoted:
            region_of[g[4]] = len(span_bands)
    regions: dict = {}
    for ch, g in oriented:
        r = region_of.get(g[4])
        if r is not None:
            regions.setdefault(r, []).append((ch, g))
    for r in range(len(span_bands) + 1):
        flush_region(regions.get(r, []))
        if r < len(span_bands):
            # a spanning RUN (an x-run subset of a merged band) need not be
            # a connected y-interval union — re-cluster it into sub-bands
            # top-to-bottom, exactly as the batch twin's per-segment band
            # stage does (degenerate zero-height glyphs make this
            # observable; for real titles it is a single band)
            for band_lo, band_hi, line in cluster_lines(span_bands[r]):
                emit_line(band_lo, band_hi, line)
    return "\n".join(unit_texts), spans
