"""HTML main-content extraction: tag-stack traversal + link-density scoring.

Re-expresses the reference's mask pipeline relationally:
- tag-stack DOM traversal with drop-subtrees  ≈ the letter-spacing veto /
  background masking (ref: interpreter.py:115-120);
- grouping text nodes into innermost block elements, with <br> splitting a
  block into line units ≈ connected-component labeling of paragraphs/lines
  (ref: interpreter.py:16-21);
- link-density threshold ≈ the mean-threshold binarization predicate
  (ref: interpreter.py:17), here Boilerpipe/Readability-style.

Deterministic, integer-arithmetic only. Operates on the generated HTML
dialect: no entities, no ``<``/``>`` inside attribute values or raw-text
elements.

Entity handling with span integrity: the five standard entity references
(``&amp; &lt; &gt; &quot; &apos;``) AND numeric character references
(``&#233;`` / ``&#x2019;`` — decimal and hex) decode to their characters,
and each entity gets its OWN span over the raw reference — so every span
slice is either verbatim or exactly one entity ref decoding to one char,
and the reconstruction invariant stays auditable at 10^12 rows
(``spans.reconstruct(..., decode_html_entities=True)``). Non-entity
ampersands and UNdecodable refs (surrogate / out-of-range code points)
stay verbatim.

Tag scanning is quote-aware (r4): a ``>`` inside a single- or double-quoted
attribute value (inline JS handlers, data-URIs, ``=>`` arrow functions —
constant in real-web HTML) does NOT terminate the tag, matching the HTML5
tokenizer's attribute-value states. An unterminated quote has two degraded
outcomes, both HTML5-consistent and never fatal: with no later matching
quote in the payload the ``<`` is unmatchable as a tag and falls through
as text; when a LATER matching quote exists, the attribute value consumes
everything up to it — including intervening ``>`` and text nodes — exactly
as the HTML5 attribute-value state would (that swallowed text is attribute
value, not document text).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from univer_ocr_spark.constants import (
    HTML_BLOCK_TAGS,
    HTML_DROP_TAGS,
    HTML_LINK_DENSITY_DEN,
    HTML_LINK_DENSITY_NUM,
    decode_entity,
)
from univer_ocr_spark.spans import Span

# Quote-aware tag scanner (unrolled-loop form — linear time, no per-char
# alternation): after the tag name, runs of chars that are neither '>' nor
# a quote, interleaved with complete quoted sections whose interior may
# contain '>'. The HTML5 tokenizer's double/single-quoted attribute-value
# states consume '>' exactly the same way.
_TAG_RE = re.compile(
    r"""<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>"']*(?:"[^"]*"[^>"']*|'[^']*'[^>"']*)*>"""
)
_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input"})
_ENT_RE = re.compile(r"&(?:amp|lt|gt|quot|apos|#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6});")

# Extractor-side block record: (tag, nodes) with nodes = [(start, end,
# in_link)] interleaved with None markers — a <br> inside the block. Each
# maximal marker-free run of nodes becomes its own extraction unit, so
# "line1<br>line2" yields two units instead of gluing the lines, WITHOUT
# inventing characters the payload doesn't contain (spans stay verbatim;
# units are joined by newline at output time).
ExtractorBlock = Tuple[str, bool, List[Tuple[int, int, bool] | None]]


def parse_blocks(payload: str) -> List[ExtractorBlock]:
    """Single pass over tags; return all blocks in document-open order with
    their text nodes and a main/boilerplate classification."""
    stack: List[str] = []
    drop_depth = 0
    link_depth = 0
    open_blocks: List[int] = []  # indices into `blocks`
    blocks: List[List] = []  # [tag, nodes]
    pos = 0

    def handle_text(start: int, end: int) -> None:
        if drop_depth > 0 or not open_blocks:
            return
        seg = payload[start:end]
        if seg.isspace():
            return
        blocks[open_blocks[-1]][1].append((start, end, link_depth > 0))  # noqa: E501

    for m in _TAG_RE.finditer(payload):
        if m.start() > pos:
            handle_text(pos, m.start())
        pos = m.end()
        g1, name = m.group(1, 2)
        closing, name = g1 == "/", name.lower()
        if name in _VOID_TAGS:
            if (
                name == "br"
                and not closing
                and drop_depth == 0
                and open_blocks
            ):
                nodes = blocks[open_blocks[-1]][1]
                if nodes and nodes[-1] is not None:
                    nodes.append(None)  # unit break inside the block
            continue
        if closing:
            # tolerant pop to the matching open tag
            while stack:
                top = stack.pop()
                if top in HTML_DROP_TAGS:
                    drop_depth -= 1
                if top == "a":
                    link_depth -= 1
                if top in HTML_BLOCK_TAGS and open_blocks:
                    open_blocks.pop()
                if top == name:
                    break
        else:
            stack.append(name)
            if name in HTML_DROP_TAGS:
                drop_depth += 1
            if name == "a":
                link_depth += 1
            if name in HTML_BLOCK_TAGS:
                open_blocks.append(len(blocks))
                blocks.append([name, []])

    if pos < len(payload):  # trailing text after the last tag (malformed doc)
        handle_text(pos, len(payload))

    out: List[ExtractorBlock] = []
    for tag, nodes in blocks:
        real = [n for n in nodes if n is not None]
        total = sum(e - s for s, e, _ in real)
        link = sum(e - s for s, e, in_link in real if in_link)
        # density classifies the whole BLOCK (boilerplate-ness is a block
        # property); <br> markers only affect unit segmentation
        is_main = total > 0 and (
            HTML_LINK_DENSITY_DEN * link <= HTML_LINK_DENSITY_NUM * total
        )
        out.append((tag, is_main, nodes))
    return out


def extract_html(payload: str) -> Tuple[str, List[Span]]:
    """Return (extracted_text, spans) for the main-content blocks; a <br>
    inside a main block starts a new unit (trailing/duplicate breaks are
    suppressed at parse time)."""
    spans: List[Span] = []
    unit_texts: List[str] = []
    unit = 0
    for _tag, is_main, nodes in parse_blocks(payload):
        if not is_main:
            continue
        parts = []
        for node in nodes:
            if node is None:  # <br>: close the current unit, open the next
                if parts:
                    unit_texts.append("".join(parts))
                    unit += 1
                    parts = []
                continue
            s, e, _ = node
            seg = payload[s:e]
            if "&" not in seg:  # fast path: entity-free node, one span
                spans.append((unit, s, e))
                parts.append(seg)
                continue
            # split at entity refs: literal runs stay verbatim slices,
            # each DECODABLE entity becomes its own span decoding to one
            # char; an undecodable ref stays inside the literal run
            pos = 0
            for m in _ENT_RE.finditer(seg):
                dec = decode_entity(m.group(0))
                if dec is None:
                    continue
                if m.start() > pos:
                    spans.append((unit, s + pos, s + m.start()))
                    parts.append(seg[pos:m.start()])
                spans.append((unit, s + m.start(), s + m.end()))
                parts.append(dec)
                pos = m.end()
            if pos < len(seg):
                spans.append((unit, s + pos, e))
                parts.append(seg[pos:])
        if parts:  # empty only after a trailing <br> — no empty unit
            unit_texts.append("".join(parts))
            unit += 1
    return "\n".join(unit_texts), spans
