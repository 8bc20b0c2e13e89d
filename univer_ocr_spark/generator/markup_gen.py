"""Tool-markup payload generator with by-construction goldens.

Models noisy tool output: content lines wrapped in markdown fences and ANSI
status lines, with inline ANSI color codes, injected confusable "echo"
characters (which the extractor collapses — analog of the reference's
similar-char collapse, ref: interpreter.py:595-614 + primitives/__init__.py:16-42),
and BLANK sentinels that reset collapse state (analog of the CTC blank,
ref: interpreter.py:606-608).

The generator tracks prev-kept state exactly like the extractor will, so the
golden text/spans are by construction, not by running the extractor.
"""

from __future__ import annotations

from random import Random
from typing import List, Tuple

from univer_ocr_spark.constants import BLANK, CONFUSABLE_OF, ESC, are_similar
from univer_ocr_spark.generator.words import ascii_word, word
from univer_ocr_spark.spans import Span

Block = Tuple[int, int, str, bool, int, int]

_ANSI_COLORS = ("31", "32", "33", "36", "0", "1;34")


def _ansi(rng: Random) -> str:
    return f"{ESC}[{rng.choice(_ANSI_COLORS)}m"


def _status_line(rng: Random) -> str:
    return f"{ESC}[2K{ESC}[33m[{ascii_word(rng, 2, 4)}] {ascii_word(rng)}...{ESC}[0m"


def generate_markup(rng: Random) -> Tuple[str, str, List[Span], List[Block]]:
    """Return (payload, gold_text, gold_spans, gold_blocks)."""
    lines: List[Tuple[str, str, str, List[Tuple[int, int]]]] = []
    # each: (kind, raw_line, gold_text, kept_runs_relative)

    def content_line() -> Tuple[str, str, List[Tuple[int, int]]]:
        raw: List[str] = []
        pos = 0
        kept: List[str] = []
        runs: List[Tuple[int, int]] = []  # kept runs, offsets relative to line
        prev_kept: str | None = None

        def emit_raw(s: str) -> None:
            nonlocal pos
            raw.append(s)
            pos += len(s)

        def emit_kept(ch: str) -> None:
            nonlocal pos, prev_kept
            # the extractor collapses a confusable of the previous kept char;
            # guard intended-kept chars with a BLANK sentinel when they would
            # collide (deterministic, mirrors CTC blank usage)
            if prev_kept is not None and are_similar(ch, prev_kept):
                emit_raw(BLANK)
            raw.append(ch)
            if runs and runs[-1][1] == pos:
                runs[-1] = (runs[-1][0], pos + 1)
            else:
                runs.append((pos, pos + 1))
            pos += 1
            kept.append(ch)
            prev_kept = ch

        n_words = rng.randint(2, 8)
        for wi in range(n_words):
            if wi > 0:
                if rng.random() < 0.2:
                    emit_raw(_ansi(rng))  # inline color between words
                emit_kept(" ")
            for ch in word(rng):
                emit_kept(ch)
                # confusable echo: extractor collapses it away
                partner = CONFUSABLE_OF.get(ch)
                if partner is not None and rng.random() < 0.25:
                    emit_raw(partner)
        if rng.random() < 0.3:
            emit_raw(f"{ESC}[0m")
        return "".join(raw), "".join(kept), runs

    payload_parts: List[str] = []
    pos = 0
    gold_units: List[str] = []
    spans: List[Span] = []
    blocks: List[Block] = []
    block_id = 0
    unit = 0

    def add_line(kind: str, raw: str, gold: str = "", runs: List[Tuple[int, int]] | None = None) -> None:
        nonlocal pos, block_id, unit
        start = pos
        payload_parts.append(raw + "\n")
        is_main = kind == "content"
        if is_main:
            for rs, re_ in runs or []:
                spans.append((unit, start + rs, start + re_))
            gold_units.append(gold)
            unit += 1
        blocks.append((block_id, 0, kind, is_main, start, start + len(raw)))
        block_id += 1
        pos += len(raw) + 1

    if rng.random() < 0.7:
        add_line("status", _status_line(rng))
    add_line("fence", f"```{ascii_word(rng, 0, 4) if rng.random() < 0.5 else ''}")
    env_pre, env_post = '{"stdout": "', '"}'
    for _ in range(rng.randint(1, 5)):
        if rng.random() < 0.2:
            add_line("status", _status_line(rng))
        raw, gold, runs = content_line()
        if rng.random() < 0.25 and gold:
            # JSON stdout envelope: wrapper is structure, inner is content
            # (alphabet excludes '"' and backslash, so no escaping needed)
            off = len(env_pre)
            raw = env_pre + raw + env_post
            runs = [(a + off, b + off) for a, b in runs]
        add_line("content", raw, gold, runs)
    add_line("fence", "```")
    if rng.random() < 0.3:
        add_line("status", _status_line(rng))

    payload = "".join(payload_parts)
    return payload, "\n".join(gold_units), spans, blocks
