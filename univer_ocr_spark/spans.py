"""Span bookkeeping.

A span is ``(unit, start, end)``: a verbatim slice ``payload[start:end]``
belonging to extraction unit ``unit`` (an HTML block, a PDF-ish line, or a
tool-markup content line). Units are numbered 0..K-1 in reading order.

Universal reconstruction invariant (property-tested):

    extracted_text == "\\n".join(
        "".join(payload[s:e] for (u, s, e) in spans if u == k)
        for k in range(n_units)
    )

Exception: PDF-ish word spaces are *inferred* from glyph x-gaps (there is no
space character in the payload), so for that archetype reconstruction holds
modulo spaces.

The reference never tracks offsets (``interpret()`` emits text only,
ref: web_app/components/interpreter/interpreter.py:110-171); spans are the
new engine's added contract per BASELINE.json.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

Span = Tuple[int, int, int]  # (unit, start, end)


def reconstruct(payload: str, spans: Sequence[Span],
                decode_html_entities: bool = False) -> str:
    """Rebuild extracted text from the payload and its spans.

    ``decode_html_entities=True`` applies the HTML archetype's span
    convention: the extractor emits each entity reference as its own span,
    so a span slice that IS a decodable entity ref (one of the five named
    refs, or a numeric ``&#NNN;``/``&#xHH;`` char reference) decodes to its
    character. Other archetypes keep every slice verbatim (a markup content
    line may legitimately contain a literal '&amp;').
    """
    from univer_ocr_spark.constants import decode_entity

    units: List[List[str]] = []
    for unit, start, end in spans:
        while len(units) <= unit:
            units.append([])
        piece = payload[start:end]
        if decode_html_entities:
            dec = decode_entity(piece)
            if dec is not None:
                piece = dec
        units[unit].append(piece)
    return "\n".join("".join(parts) for parts in units)


def validate_spans(payload: str, spans: Iterable[Span]) -> None:
    """Assert spans are in-bounds, unit-ordered, and globally non-overlapping.

    Note: *within* a unit spans are payload-order for HTML/markup but may be
    payload-unordered for PDF-ish (glyph records are shuffled in the raw
    payload); global non-overlap is checked by sorting.
    """
    prev_unit = -1
    intervals = []
    for unit, start, end in spans:
        if not (0 <= start < end <= len(payload)):
            raise AssertionError(f"span out of bounds: {(unit, start, end)}")
        if unit < prev_unit:
            raise AssertionError(f"unit order violated at {(unit, start, end)}")
        prev_unit = unit
        intervals.append((start, end))
    intervals.sort()
    for (s1, e1), (s2, e2) in zip(intervals, intervals[1:]):
        if s2 < e1:
            raise AssertionError(f"overlapping spans: {(s1, e1)} / {(s2, e2)}")
