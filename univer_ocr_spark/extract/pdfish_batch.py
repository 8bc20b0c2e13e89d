"""Batch-vectorized PDF-ish extraction: one NumPy pass over ALL glyphs of an
Arrow batch (thousands of turns), instead of per-payload Python loops.

This is the reference's X6 lesson (vectorized batching — one GEMM-able
tensor instead of per-pixel Python, ref: convolutional.py:330-373) applied
at the right granularity for Spark: per-payload NumPy loses to pure Python
at ~130 glyphs/payload (fixed overhead), but across a 2048-turn Arrow batch
(~270k glyphs) the int-parse, interval-merge, sort and space/gap logic all
amortize into a handful of vectorized kernels.

Semantics are identical to extract_pdfish (property-tested equal); payloads
that fail strict-format validation fall back to the tolerant per-payload
parser individually.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from univer_ocr_spark.constants import (
    PDFISH_MAGIC,
    PDFISH_MARGIN_DEN,
    PDFISH_MARGIN_NUM,
    PDFISH_SPACE_DEN,
    PDFISH_SPACE_NUM,
)
from univer_ocr_spark.extract.pdfish_extract import extract_pdfish
from univer_ocr_spark.spans import Span

Result = Tuple[str, List[Span]]


def _body_well_formed(body: str) -> bool:
    """Cheap C-level scans that guarantee single-space separation (what the
    offset math assumes). Structural alignment is then enforced by the
    set/length/int checks below — a payload passing all of them but still
    misaligned would require adversarially crafted input, and even then the
    failure mode is wrong-output-for-that-row, never a crash."""
    return not ("  " in body or "\t" in body or "\n " in body or " \n" in body
                or body.startswith(" "))


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
    if min(y.min(), ht.min(), x.min(), wd.min()) < 0 or nums.max() > 2**31:
        # negative coords/extents, or coords big enough that pid*big band
        # keying (and shift math) could wrap int64 → tolerant per-row path
        for i in pids:
            results[i] = extract_pdfish(payloads[i])
        return results

    # per-payload orientation vote (A9 analog): rotated pages have glyphs
    # wider than tall; swap axes so the portrait pipeline handles both
    wd_sum = np.add.reduceat(wd, gstart)
    ht_sum = np.add.reduceat(ht, gstart)
    rot_pid = wd_sum > ht_sum
    if rot_pid.any():
        rot_g = np.repeat(rot_pid, cnt)
        shift = int((x + wd).max()) + 1
        bx = np.where(rot_g, y, x)                 # reading coord
        by = np.where(rot_g, shift - (x + wd), y)  # band coord (kept >= 0)
        bw = np.where(rot_g, ht, wd)               # reading extent
        bh = np.where(rot_g, wd, ht)               # band extent
    else:
        shift = 0
        bx, by, bw, bh = x, y, wd, ht

    # ---- char offsets into each raw payload
    lens = np.fromiter(map(len, all_lines), dtype=np.int64, count=G)
    ends_rel = np.cumsum(lens + 1)
    starts_rel = ends_rel - (lens + 1)
    base = np.asarray(hdr_len, dtype=np.int64) - starts_rel[gstart]
    offs = starts_rel + np.repeat(base, cnt) + 2

    # ---- interval-union clustering per payload (pid*BIG keying keeps
    # payloads from ever merging; coords validated non-negative above)
    end_y = by + bh
    big = int(end_y.max()) + 1
    ykey = by + pid * big
    endkey = end_y + pid * big
    order = np.lexsort((bx, ykey))
    yk_s = ykey[order]
    run_end = np.maximum.accumulate(endkey[order])
    brk = np.empty(G, dtype=bool)
    brk[0] = True
    brk[1:] = yk_s[1:] >= run_end[:-1]
    band = np.cumsum(brk) - 1  # global band id (pid-contiguous)

    brk_idx = np.flatnonzero(brk)
    band_lo = by[order][brk_idx]
    band_hi = np.maximum.reduceat(end_y[order], brk_idx)
    band_pid = pid[order][brk_idx]
    band_rot = rot_pid[band_pid] if rot_pid.any() else np.zeros(len(band_pid), bool)
    dim = np.where(
        band_rot,
        np.asarray(page_ws, dtype=np.int64)[band_pid],
        np.asarray(page_hs, dtype=np.int64)[band_pid],
    )
    # rotated band coords were mapped through shift-(x+wd): map centers back
    c2 = np.where(band_rot, 2 * shift - (band_lo + band_hi), band_lo + band_hi)
    keep_band = ~(
        (PDFISH_MARGIN_DEN * c2 < 2 * PDFISH_MARGIN_NUM * dim)
        | (PDFISH_MARGIN_DEN * c2 > 2 * (PDFISH_MARGIN_DEN - PDFISH_MARGIN_NUM) * dim)
    )
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

    # ---- assemble per payload (glyphs are pid-contiguous in reading order)
    pid2 = pid[g2]
    offs2 = offs[g2]
    unit2 = unit_of_band[band2]
    pid_bounds = np.searchsorted(pid2, np.arange(P + 1))
    for k in range(P):
        lo, hi = int(pid_bounds[k]), int(pid_bounds[k + 1])
        kg = keep_g[lo:hi]
        sel = np.flatnonzero(kg) + lo
        text = "".join([pieces[j] for j in sel.tolist()])
        u = unit2[sel]
        o = offs2[sel]
        spans = list(zip(u.tolist(), o.tolist(), (o + 1).tolist()))
        results[pids[k]] = (text, spans)
    return results
