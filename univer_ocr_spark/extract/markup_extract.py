"""Tool-markup extraction: structural-line drop, ANSI strip, blank-sentinel
CTC-style collapse of confusable characters.

Re-expresses the reference's decode tail: per-line scan where a blank resets
state and emits nothing, and consecutive *similar* characters collapse into
the first occurrence (ref: web_app/components/interpreter/interpreter.py:595-614;
similar-pairs table ref: web_app/components/primitives/__init__.py:16-42).
Unlike the reference we collapse only distinct lookalikes, not identical
repeats — doubled letters in transcripts are genuine content.

Span bookkeeping maps every kept character back to its raw-payload offset;
consecutive kept offsets merge into runs.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from univer_ocr_spark.constants import BLANK, ESC, _SIMILAR_SET
from univer_ocr_spark.spans import Span

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*[A-Za-z]")

# JSON stdout envelope (FIXTURES §2c): the machine wrapper is structure, the
# inner string is content. Only unescaped-safe content is generated (the
# alphabet excludes '"' and '\\'), so the inner slice stays verbatim.
_ENV_PRE = '{"stdout": "'
_ENV_POST = '"}'


def _is_dropped_line(line: str) -> bool:
    return line.startswith(ESC + "[2K") or line.startswith("```")


def extract_markup(payload: str) -> Tuple[str, List[Span]]:
    """Return (extracted_text, spans)."""
    spans: List[Span] = []
    unit_texts: List[str] = []
    unit = 0
    line_start = 0
    n = len(payload)
    while line_start < n:
        nl = payload.find("\n", line_start)
        line_end = n if nl == -1 else nl
        line = payload[line_start:line_end]
        if line.endswith("\r"):  # CRLF input: \r is structure, strip it
            line = line[:-1]     # BEFORE envelope detection (endswith '"}')
        if not _is_dropped_line(line) and line:
            # JSON envelope: strip the wrapper, scan only the inner string
            if line.startswith(_ENV_PRE) and line.endswith(_ENV_POST) and len(
                line
            ) > len(_ENV_PRE) + len(_ENV_POST) - 1:
                content = line[len(_ENV_PRE) : -len(_ENV_POST)]
                base = line_start + len(_ENV_PRE)
            else:
                content, base = line, line_start
            # fast path: a pure-ASCII line with no ESC cannot contain a
            # Cyrillic confusable or the BLANK sentinel — everything is kept
            # verbatim (one span). C-level checks only.
            if content and ESC not in content and content.isascii():
                spans.append((unit, base, base + len(content)))
                unit_texts.append(content)
                unit += 1
                if nl == -1:
                    break
                line_start = nl + 1
                continue
            kept: List[str] = []
            runs: List[Tuple[int, int]] = []
            prev_kept: Optional[str] = None
            i = 0
            ln = len(content)
            while i < ln:
                ch = content[i]
                if ch == ESC:
                    m = _ANSI_RE.match(content, i)
                    if m:
                        i = m.end()
                        continue
                    i += 1  # stray ESC: drop it
                    continue
                if ch == BLANK:
                    prev_kept = None
                    i += 1
                    continue
                if prev_kept is not None and (ch, prev_kept) in _SIMILAR_SET:
                    i += 1  # collapse lookalike echo
                    continue
                off = base + i
                if runs and runs[-1][1] == off:
                    runs[-1] = (runs[-1][0], off + 1)
                else:
                    runs.append((off, off + 1))
                kept.append(ch)
                prev_kept = ch
                i += 1
            if kept:
                for rs, re_ in runs:
                    spans.append((unit, rs, re_))
                unit_texts.append("".join(kept))
                unit += 1
        if nl == -1:
            break
        line_start = nl + 1
    return "\n".join(unit_texts), spans
