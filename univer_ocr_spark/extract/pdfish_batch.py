"""Batch-vectorized PDF-ish extraction: one NumPy pass over ALL glyphs of an
Arrow batch (thousands of turns), instead of per-payload Python loops.

This is the reference's X6 lesson (vectorized batching — one GEMM-able
tensor instead of per-pixel Python, ref: convolutional.py:330-373) applied
at the right granularity for Spark: per-payload NumPy loses to pure Python
at ~130 glyphs/payload (fixed overhead), but across a 2048-turn Arrow batch
(~270k glyphs) the int-parse, orientation vote, column/band interval-merge,
sort and space/gap logic all amortize into a handful of vectorized kernels.

Semantics are identical to extract_pdfish (property-tested equal): 4-way
orientation vote (aspect + margin-excluded mass-center), spanning-block
pre-pass (full-width titles emit as their own segments; columns cluster
per region between them), x-gap column clustering, y-band merging, margin
strip, reading order, word-gap spaces.
Payloads that fail strict-format validation fall back to the tolerant
per-payload parser individually.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

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
from univer_ocr_spark.extract.pdfish_extract import extract_pdfish
from univer_ocr_spark.spans import Span

Result = Tuple[str, List[Span]]

_COORD_BOUND = 2**31  # larger coords/dims → tolerant path (keying math)


def _body_well_formed(body: str) -> bool:
    """Cheap C-level scans that guarantee single-space separation (what the
    offset math assumes). Structural alignment is then enforced by the
    set/length/int checks below — a payload passing all of them but still
    misaligned would require adversarially crafted input, and even then the
    failure mode is wrong-output-for-that-row, never a crash."""
    return not ("  " in body or "\t" in body or "\n " in body or " \n" in body
                or body.startswith(" "))


def _margin_mask(c2: np.ndarray, dim: np.ndarray) -> np.ndarray:
    """True where a center (2·coord+extent) falls in the top/bottom 10%."""
    return (PDFISH_MARGIN_DEN * c2 < 2 * PDFISH_MARGIN_NUM * dim) | (
        PDFISH_MARGIN_DEN * c2
        > 2 * (PDFISH_MARGIN_DEN - PDFISH_MARGIN_NUM) * dim
    )


def extract_pdfish_many(payloads: Sequence[str]) -> List[Result]:
    results: List[Result] = [None] * len(payloads)  # type: ignore[list-item]

    # ---- per-payload light validation + line collection (C-level splits)
    pids: List[int] = []
    all_lines: List[str] = []
    all_chs: List[str] = []
    counts: List[int] = []
    hdr_len: List[int] = []
    page_ws: List[int] = []
    page_hs: List[int] = []
    num_toks: List[str] = []
    for i, p in enumerate(payloads):
        nl = p.find("\n")
        hdr = p[:nl].split(" ") if nl != -1 else []
        if len(hdr) != 3 or hdr[0] != PDFISH_MAGIC:
            results[i] = extract_pdfish(p)
            continue
        try:
            page_w, page_h = int(hdr[1]), int(hdr[2])
        except ValueError:
            results[i] = extract_pdfish(p)
            continue
        if abs(page_w) > _COORD_BOUND or abs(page_h) > _COORD_BOUND:
            results[i] = extract_pdfish(p)  # dims outside int64-safe math
            continue
        body = p[nl + 1 :]
        if not body:
            results[i] = ("", [])
            continue
        lines = body.split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        toks = body.split()
        if (
            not lines
            or len(toks) != 6 * len(lines)
            or not _body_well_formed(body)
        ):
            results[i] = extract_pdfish(p)
            continue
        chs = toks[1::6]
        # per-line arity: with single-space separation guaranteed above,
        # exactly 5 spaces per line <=> exactly 6 tokens per line; without
        # this, a 10-token line + a 2-token line can masquerade as aligned
        if (
            set(toks[0::6]) != {"g"}
            or max(map(len, chs)) != 1
            or not all(ln.count(" ") == 5 for ln in lines)
        ):
            results[i] = extract_pdfish(p)
            continue
        pids.append(i)
        counts.append(len(lines))
        all_lines.extend(lines)
        all_chs.extend(chs)
        del toks[0::6]  # drop 'g'
        del toks[0::5]  # drop <ch> (now at stride-5 position 0)
        num_toks.extend(toks)
        hdr_len.append(nl + 1)
        page_ws.append(page_w)
        page_hs.append(page_h)

    if not pids:
        return results

    G = len(all_chs)
    P = len(pids)
    cnt = np.asarray(counts, dtype=np.int64)
    gstart = np.zeros(P, dtype=np.int64)
    np.cumsum(cnt[:-1], out=gstart[1:])
    pid = np.repeat(np.arange(P, dtype=np.int64), cnt)

    try:
        nums = np.asarray(num_toks, dtype=np.int64)
    except (ValueError, OverflowError):
        # a non-integer or >int64 field somewhere: route every vector-path
        # payload through the tolerant parser (rare, malformed data only)
        for i in pids:
            results[i] = extract_pdfish(payloads[i])
        return results
    nums = nums.reshape(G, 4)
    x, y, wd, ht = nums[:, 0], nums[:, 1], nums[:, 2], nums[:, 3]
    if min(y.min(), ht.min(), x.min(), wd.min()) < 0 or nums.max() > _COORD_BOUND:
        # negative coords/extents, or coords big enough that the offset-key
        # band/column math could wrap int64 → tolerant per-row path
        for i in pids:
            results[i] = extract_pdfish(payloads[i])
        return results

    pw = np.asarray(page_ws, dtype=np.int64)
    ph = np.asarray(page_hs, dtype=np.int64)

    # ---- 4-way orientation vote per payload (A9 analog):
    # aspect (Σwd vs Σht) → portrait/landscape; margin-excluded mass-center
    # along the band axis → 0 vs 180 / 90 vs 270 (same vote as the slow path)
    wd_sum = np.add.reduceat(wd, gstart)
    ht_sum = np.add.reduceat(ht, gstart)
    landscape = wd_sum > ht_sum

    cx2 = 2 * x + wd
    cy2 = 2 * y + ht
    in_x = ~_margin_mask(cx2, pw[pid])
    in_y = ~_margin_mask(cy2, ph[pid])
    cnt_x = np.add.reduceat(in_x.astype(np.int64), gstart)
    cnt_y = np.add.reduceat(in_y.astype(np.int64), gstart)
    sum_x = np.add.reduceat(np.where(in_x, cx2, 0), gstart)
    sum_y = np.add.reduceat(np.where(in_y, cy2, 0), gstart)
    mass_x = (cnt_x > 0) & (sum_x > cnt_x * pw)   # stored-x mass below middle
    mass_y = (cnt_y > 0) & (sum_y > cnt_y * ph)   # stored-y mass below middle

    # orientation code: 0=upright, 1=90°CW, 2=180°, 3=270°CW
    orient_p = np.where(landscape, np.where(mass_x, 1, 3), np.where(mass_y, 2, 0))
    o = orient_p[pid]

    # ---- remap to upright reading coords; negations become S-c (order-
    # preserving, non-negative) with one global shift S
    S = int(max((x + wd).max(), (y + ht).max())) + 1
    neg_x = S - (x + wd)
    neg_y = S - (y + ht)
    bx = np.select([o == 0, o == 1, o == 2], [x, y, neg_x], default=neg_y)
    by = np.select([o == 0, o == 1, o == 2], [y, neg_x, neg_y], default=x)
    portrait_g = (o == 0) | (o == 2)
    bw = np.where(portrait_g, wd, ht)
    bh = np.where(portrait_g, ht, wd)
    negband_p = (orient_p == 1) | (orient_p == 2)  # band coords were negated
    dim_p = np.where((orient_p == 0) | (orient_p == 2), ph, pw)

    # ---- char offsets into each raw payload
    lens = np.fromiter(map(len, all_lines), dtype=np.int64, count=G)
    ends_rel = np.cumsum(lens + 1)
    starts_rel = ends_rel - (lens + 1)
    base = np.asarray(hdr_len, dtype=np.int64) - starts_rel[gstart]
    offs = starts_rel + np.repeat(base, cnt) + 2

    # ---- spanning-block pre-pass (r3; r4 run-level — mirrors the slow
    # path exactly): page-global y-bands are split into x-runs (the
    # column-gap rule); ANY single run covering >= 3/5 of the reading-axis
    # extent is a full-width block (spanning title/abstract) and becomes
    # its OWN segment — even when its band also holds x-disjoint column
    # lines (overlapping-band titles, the r3 degraded mode); a band's
    # non-spanning runs join the region BELOW its spanning runs.
    thresh_p = PDFISH_COL_GAP_FACTOR * np.maximum.reduceat(bw, gstart)
    thresh_g = thresh_p[pid]
    rdim_p = np.where((orient_p == 0) | (orient_p == 2), pw, ph)

    bigy = S + 1
    gykey = by + pid * bigy
    gyend = by + bh + pid * bigy
    # bx tiebreak matches the slow path's (y, x) sort: for NORMAL glyphs tie
    # order is invisible (equal-y intervals overlap, so they merge into one
    # band either way), but degenerate ZERO-HEIGHT glyphs have empty
    # y-intervals where every tie breaks a band — segmentation then follows
    # the tie order, which must be the slow path's
    gord = np.lexsort((bx, gykey))
    grun_end = np.maximum.accumulate(gyend[gord])
    gbrk = np.empty(G, dtype=bool)
    gbrk[0] = True
    gbrk[1:] = gykey[gord][1:] >= grun_end[:-1]
    gband_sorted = np.cumsum(gbrk) - 1
    gband = np.empty(G, dtype=np.int64)
    gband[gord] = gband_sorted          # global y-band id, (pid, y)-ascending
    NB = int(gband_sorted[-1]) + 1
    gband_pid = pid[gord][np.flatnonzero(gbrk)]

    # per-band x-runs + extent (the same gap rule column clustering uses);
    # runs are indexed ascending in (pid, band-y, x) by construction
    bigx = S + int(thresh_p.max()) + 1
    bxkey = bx + gband * bigx
    bxend = bx + bw + gband * bigx
    bord = np.argsort(bxkey, kind="stable")
    brun_end = np.maximum.accumulate(bxend[bord])
    bbrk = np.empty(G, dtype=bool)
    bbrk[0] = True
    bbrk[1:] = bxkey[bord][1:] >= brun_end[:-1] + thresh_g[bord][1:]
    run_first = np.flatnonzero(bbrk)
    NR = run_first.size
    run_x_lo = bx[bord][run_first]
    run_x_hi = np.maximum.reduceat((bx + bw)[bord], run_first)
    run_band = gband[bord][run_first]
    run_pid = gband_pid[run_band]
    run_span = PDFISH_SPAN_DEN * (run_x_hi - run_x_lo) >= (
        PDFISH_SPAN_NUM * rdim_p[run_pid]
    )
    grun_sorted = np.cumsum(bbrk) - 1        # run id, ascending in (band, x)
    grun = np.empty(G, dtype=np.int64)
    grun[bord] = grun_sorted                 # run id per glyph

    # ---- r5 glyph-height split (mirrors _height_split in the slow path):
    # a spanning-sized run with MIXED heights (title and column line in the
    # SAME x-run) splits at the height midpoint (2·ht > max+min). The tall
    # subset is promoted to the spanning block only if it alone passes the
    # extent test AND stays a single x-run under the page gap rule; the
    # short glyphs demote to the band's region below.
    run_bh_lo = np.minimum.reduceat(bh[bord], run_first)
    run_bh_hi = np.maximum.reduceat(bh[bord], run_first)
    mixed = run_span & (run_bh_lo != run_bh_hi)
    run_split = np.zeros(NR, dtype=bool)
    tall_g = np.zeros(G, dtype=bool)
    if mixed.any():
        tall_g = mixed[grun] & (2 * bh > (run_bh_lo + run_bh_hi)[grun])
        tall_lo = np.full(NR, np.iinfo(np.int64).max, dtype=np.int64)
        tall_hi = np.full(NR, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(tall_lo, grun[tall_g], bx[tall_g])
        np.maximum.at(tall_hi, grun[tall_g], (bx + bw)[tall_g])
        # mixed runs always have ≥1 tall glyph (the max-height one)
        tall_spans = mixed & (
            PDFISH_SPAN_DEN * (tall_hi - tall_lo)
            >= PDFISH_SPAN_NUM * rdim_p[run_pid]
        )
        # single-x-run check for the tall subset: walk tall glyphs in
        # (run, x) order, break where x ≥ running-max-end + thresh (the
        # same gap rule; segmented cummax via the run-offset trick — ends
        # stay < bigx, so higher runs always dominate the running max)
        tb = tall_g[bord]
        it = bord[tb]
        tr = grun[it]
        te = (bx + bw)[it] + tr * bigx
        ce = np.maximum.accumulate(te) - tr * bigx
        brk_t = np.zeros(it.size, dtype=bool)
        if it.size > 1:
            same_run = tr[1:] == tr[:-1]
            brk_t[1:] = same_run & (
                bx[it][1:] >= ce[:-1] + thresh_g[it][1:]
            )
        disc = np.zeros(NR, dtype=bool)
        np.logical_or.at(disc, tr[brk_t], True)
        run_split = tall_spans & ~disc
        tall_g &= run_split[grun]

    # segment per RUN: the payload's k-th spanning run -> seg 2k+1; a
    # non-spanning run sits in the region AFTER all spanning runs of its
    # own band (k = spanning runs in earlier bands + in this band) -> seg
    # 2k — the interleaved reading order (region above the title, title,
    # region below), degenerating to the r3 band-level segmentation when
    # every band is pure
    span_i = run_span.astype(np.int64)
    bstart_runs = np.searchsorted(run_band, np.arange(NB))
    band_nspan = np.add.reduceat(span_i, bstart_runs)
    cum_span_band = np.cumsum(band_nspan) - band_nspan  # before band, global
    pid_first_gband = np.searchsorted(gband_pid, np.arange(P))
    base_pid = cum_span_band[pid_first_gband]  # before payload start
    srank = np.cumsum(span_i) - span_i  # spanning runs before run, global
    region_seg_of_run = 2 * (
        cum_span_band[run_band] + band_nspan[run_band] - base_pid[run_pid]
    )
    seg_of_run = np.where(
        run_span, 2 * (srank - base_pid[run_pid]) + 1, region_seg_of_run
    )
    # per-GLYPH segment: short glyphs of height-split runs demote to their
    # band's region segment (a split run keeps its spanning seg for the
    # tall subset, so the span ranks/counts above are unchanged)
    seg_g = seg_of_run[grun]
    split_any = bool(run_split.any())
    if split_any:
        demote_g = run_split[grun] & ~tall_g
        seg_g = np.where(demote_g, region_seg_of_run[grun], seg_g)
    segbound = int(seg_g.max()) + 1
    if (P * segbound + 1) * int(bigx) > 2 ** 62:
        # composite segment keys would overflow int64 — adversarial-scale
        # coords only; route through the tolerant per-row parser
        for i in pids:
            results[i] = extract_pdfish(payloads[i])
        return results
    greg_of_run = run_pid * segbound + seg_of_run

    # ---- column clustering per (payload, segment): x-projection union with
    # gap threshold = COL_GAP_FACTOR * max reading extent (page-global). A
    # spanning segment is one x-run by construction (height-split promotion
    # requires it too) -> exactly one column, so the shared pipeline below
    # handles both segment kinds uniformly.
    if split_any:
        # a height-split run's SHORT remainder need not be a contiguous
        # x-interval (the tall glyphs it lost may have bridged gaps), so
        # run granularity is unsound for this batch: cluster at GLYPH
        # granularity, exactly the slow path's cluster_columns (rare —
        # only batches containing mixed-height spanning runs pay the
        # G-length sort)
        greg_g = pid * segbound + seg_g
        gxkey = bx + greg_g * bigx
        gxend = bx + bw + greg_g * bigx
        ordc = np.argsort(gxkey, kind="stable")
        cend = np.maximum.accumulate(gxend[ordc])
        brkc = np.empty(G, dtype=bool)
        brkc[0] = True
        brkc[1:] = gxkey[ordc][1:] >= cend[:-1] + thresh_g[ordc][1:]
        col_sorted = np.cumsum(brkc) - 1
        col = np.empty(G, dtype=np.int64)
        col[ordc] = col_sorted  # global column id, ascending in (pid, seg, x)
    else:
        # run granularity: each band x-run is a contiguous x-interval whose
        # internal gaps are < thresh (by run construction), and
        # interval-union connectivity is associative, so the union of runs
        # equals the union of their glyphs — one small sort over ~#lines
        # runs instead of a G-length sort (measured section win)
        run_thresh = thresh_p[run_pid]
        rkey = run_x_lo + greg_of_run * bigx
        rend = run_x_hi + greg_of_run * bigx
        ordr = np.argsort(rkey, kind="stable")
        rrun_end = np.maximum.accumulate(rend[ordr])
        brkc = np.empty(NR, dtype=bool)
        brkc[0] = True
        brkc[1:] = rkey[ordr][1:] >= rrun_end[:-1] + run_thresh[ordr][1:]
        col_sorted = np.cumsum(brkc) - 1
        col_run = np.empty(NR, dtype=np.int64)
        col_run[ordr] = col_sorted
        col = col_run[grun]  # global column id, ascending in (pid, seg, x)

    # ---- y-interval band clustering per column (col id is globally unique)
    ykey = by + col * bigy
    endkey = by + bh + col * bigy
    order = np.lexsort((bx, ykey))
    yk_s = ykey[order]
    run_end = np.maximum.accumulate(endkey[order])
    brk = np.empty(G, dtype=bool)
    brk[0] = True
    brk[1:] = yk_s[1:] >= run_end[:-1]
    band = np.cumsum(brk) - 1  # global band id (pid- and col-contiguous)

    brk_idx = np.flatnonzero(brk)
    band_lo = by[order][brk_idx]
    band_hi = np.maximum.reduceat((by + bh)[order], brk_idx)
    band_pid = pid[order][brk_idx]
    c2t = band_lo + band_hi
    c2 = np.where(negband_p[band_pid], 2 * S - c2t, c2t)
    keep_band = ~_margin_mask(c2, dim_p[band_pid])
    kept_cum = np.cumsum(keep_band)
    first_band = np.searchsorted(band_pid, np.arange(P))
    pid_base = kept_cum[first_band] - keep_band[first_band]
    unit_of_band = kept_cum - 1 - pid_base[band_pid]  # unit id within payload

    # ---- reading order (band, x) + word-gap spaces
    ord2 = np.lexsort((bx[order], band))
    g2 = order[ord2]  # original glyph index in reading order
    band2 = band[ord2]
    x2, w2 = bx[g2], bw[g2]
    same = np.empty(G, dtype=bool)
    same[0] = False
    same[1:] = band2[1:] == band2[:-1]
    gap = np.empty(G, dtype=np.int64)
    gap[0] = 0
    gap[1:] = x2[1:] - (x2[:-1] + w2[:-1])
    space = np.zeros(G, dtype=bool)
    space[1:] = (
        same[1:]
        & (gap[1:] >= 1)
        & (PDFISH_SPACE_DEN * gap[1:] >= PDFISH_SPACE_NUM * w2[:-1])
    )

    keep_g = keep_band[band2]
    new_band = ~same  # first glyph of its band (in reading order)
    # lead char: '\n' before a band that isn't the payload's first KEPT band,
    # ' ' on word gaps, '' otherwise
    is_first_kept_band = unit_of_band[band2] == 0
    pieces = [all_chs[j] for j in g2.tolist()]
    for j in np.flatnonzero(space).tolist():
        pieces[j] = " " + pieces[j]
    for j in np.flatnonzero(new_band & ~is_first_kept_band).tolist():
        pieces[j] = "\n" + pieces[j]

    # ---- assemble per payload (glyphs are pid-contiguous in reading order);
    # the kept-glyph selection and the three span columns materialize ONCE
    # globally — per-payload work is pure list slicing (was a per-payload
    # flatnonzero + fancy-index + tolist: measured ~2.5x slower)
    sel_all = np.flatnonzero(keep_g)
    kept_bounds = np.searchsorted(pid[g2][sel_all], np.arange(P + 1))
    u_all = unit_of_band[band2][sel_all].tolist()
    o_arr = offs[g2][sel_all]
    o_all = o_arr.tolist()
    e_all = (o_arr + 1).tolist()
    kept_pieces = [pieces[j] for j in sel_all.tolist()]
    for k in range(P):
        lo, hi = int(kept_bounds[k]), int(kept_bounds[k + 1])
        results[pids[k]] = (
            "".join(kept_pieces[lo:hi]),
            list(zip(u_all[lo:hi], o_all[lo:hi], e_all[lo:hi])),
        )
    return results
