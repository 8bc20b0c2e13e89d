"""Shared constants: alphabet, confusable pairs, extraction thresholds.

The alphabet mirrors the reference's CHARS set (Cyrillic + Latin + digits +
punctuation, ref: web_app/components/primitives/__init__.py:6-14) minus the
characters our payload encodings reserve (``< > &`` for HTML, backtick for
markdown fences, the ESC and BLANK control characters for tool markup).

The confusable (lookalike) pairs re-express the reference's
``SIMILAR_CHARS`` table of 17 Cyrillic/Latin pairs
(ref: web_app/components/primitives/__init__.py:16-42) used by its CTC-style
collapse (ref: web_app/components/interpreter/interpreter.py:595-614).
"""

from __future__ import annotations

import hashlib

GLOBAL_SEED = 42

# Reserved / structural characters (never appear in generated content text).
ESC = "\x1b"
BLANK = "␀"  # SYMBOL FOR NULL — the CTC-style blank sentinel (emits
# nothing, resets collapse state; ref: interpreter.py:606-608 char id 0).

_CYR_LOWER = "абвгдежзийклмнопрстуфхцчшщъыьэюя"
_CYR_UPPER = _CYR_LOWER.upper()
_LAT_LOWER = "abcdefghijklmnopqrstuvwxyz"
_LAT_UPPER = _LAT_LOWER.upper()
_DIGITS = "0123456789"
# Punctuation without < > & ` " ' \ (reserved for payload structure).
_PUNCT = "!#$%()*+,-./:;=?@[]^_{|}~"

ALPHABET = _LAT_LOWER + _LAT_UPPER + _CYR_LOWER + _CYR_UPPER + _DIGITS + _PUNCT

# 17 Cyrillic/Latin lookalike pairs (ref: primitives/__init__.py:16-42).
SIMILAR_PAIRS: tuple[tuple[str, str], ...] = (
    ("а", "a"), ("е", "e"), ("о", "o"), ("р", "p"), ("с", "c"),
    ("у", "y"), ("х", "x"),
    ("А", "A"), ("В", "B"), ("Е", "E"), ("К", "K"), ("М", "M"),
    ("Н", "H"), ("О", "O"), ("Р", "P"), ("С", "C"), ("Т", "T"),
)

_SIMILAR_SET = frozenset(SIMILAR_PAIRS) | frozenset((b, a) for a, b in SIMILAR_PAIRS)
# partner lookup: char -> its confusable twin
CONFUSABLE_OF = {a: b for a, b in SIMILAR_PAIRS}
CONFUSABLE_OF.update({b: a for a, b in SIMILAR_PAIRS})


def are_similar(c1: str, c2: str) -> bool:
    """Lookalike predicate over the confusable pairs.

    Unlike the reference (which also collapses *identical* consecutive
    chars, CTC-style), we collapse only *distinct* lookalikes — identical
    repeats in transcript text are genuine content, not OCR stutter.
    """
    return (c1, c2) in _SIMILAR_SET


# ---------------------------------------------------------------- HTML ----
# The five standard entity references the HTML extractor decodes. Each
# decoded entity gets its OWN span over the raw reference, so spans stay
# auditable: a span slice is either verbatim or exactly one entity ref.
HTML_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
}


def decode_entity(ref: str) -> str | None:
    """Decode one entity reference (named or numeric) to its character, or
    None when ``ref`` is not decodable — an undecodable ref stays verbatim
    in the extracted text, it is never an error (10^12-row tolerance).

    Numeric character references — ``&#233;`` / ``&#x2019;``, ubiquitous in
    real HTML — decode via the code point; surrogates and out-of-range
    code points are rejected (kept verbatim) like a browser's parse-error
    path, minus the U+FFFD replacement, so every decoded span is exactly
    one real character.
    """
    named = HTML_ENTITIES.get(ref)
    if named is not None:
        return named
    if not (ref.startswith("&#") and ref.endswith(";")):
        return None
    body = ref[2:-1]
    # Strict digit validation mirroring the extractor's _ENT_RE character
    # classes: bare int() also accepts signs, whitespace, underscores and
    # Unicode digits, so '&#6_5;'/'&# 65;' would stay verbatim in
    # extracted_text yet DECODE in reconstruct() — silently breaking the
    # 10^12-row audit invariant (reconstruct == extracted).
    if body[:1] in ("x", "X"):
        digits = body[1:]
        if not digits or any(c not in "0123456789abcdefABCDEF" for c in digits):
            return None
        cp = int(digits, 16)
    else:
        if not body or any(c not in "0123456789" for c in body):
            return None
        cp = int(body)
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return None
    return chr(cp)
# Tags whose entire subtree is boilerplate by construction (analog of the
# reference's letter-spacing veto P4 / background pixels).
HTML_DROP_TAGS = frozenset(
    {"script", "style", "title", "head", "nav", "aside", "footer", "header"}
)
# Block-level container tags: one extraction "unit" per innermost open block
# (analog of connected-component labeling A1, interpreter.py:16-21).
HTML_BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "div",
     "td", "blockquote"}
)
# A block is main-content iff link_chars / total_chars <= 0.4
# (Boilerpipe/Readability-style link-density heuristic). Expressed in
# integers to stay exact: 10 * link_chars <= 4 * total_chars.
HTML_LINK_DENSITY_NUM = 4
HTML_LINK_DENSITY_DEN = 10

# -------------------------------------------------------------- PDF-ish ---
PDFISH_MAGIC = "%PDFISH"
# Lines whose vertical band center falls in the top/bottom 10% of the page
# are header/footer boilerplate (integer rule: 10*cy < h  or  10*cy > 9*h).
PDFISH_MARGIN_NUM = 1
PDFISH_MARGIN_DEN = 10
# A space is inserted between consecutive glyphs when the x-gap is at least
# half the previous glyph's width (integer rule: 2*gap >= prev_w, gap >= 1).
PDFISH_SPACE_NUM = 1
PDFISH_SPACE_DEN = 2
# Column split (multi-column reading order): two glyph runs belong to
# different columns when the gap between their x-projections is at least
# COL_GAP_FACTOR × the page's max glyph reading-extent. Word gaps (~1 glyph
# width) never split; a deliberate column gutter (≥4 widths) always does.
PDFISH_COL_GAP_FACTOR = 4
# Spanning block (a full-width title/abstract bridging a column gutter):
# a page-global y-band whose glyphs form ONE x-run (no column gap inside)
# covering at least 3/5 of the page's reading-axis extent is emitted as its
# own full-width block BEFORE column clustering, so it cannot glue the
# columns together (integer rule: 5 * extent >= 3 * reading_dim). Two
# parallel column lines at the same y are ≥2 runs, never spanning.
PDFISH_SPAN_NUM = 3
PDFISH_SPAN_DEN = 5


SESSION_GAP_SECONDS = 1800  # gap that starts a new session (batch + streaming)

# ------------------------------------------------- cross-engine regexes ---
# Whitespace class spelled out, NEVER \s, wherever a Spark expression and its
# DuckDB oracle twin must agree byte-for-byte: Java regex \s includes \x0B
# (vertical tab) while RE2's does not, and Python str.split() additionally
# splits on Unicode spaces. One explicit class = one semantics on all three.
WS_CLASS = r"[ \t\n\x0B\f\r]"


def turn_seed(conv_id: str, turn_idx: int, global_seed: int = GLOBAL_SEED) -> int:
    """Deterministic per-turn seed, independent of process/hash-seed/partitioning.

    The reference uses unseeded ``random`` (generate.py:129-130); we fix that
    per FIXTURES.md with seed = f(global_seed, conv_id, turn_idx).
    """
    key = f"{global_seed}|{conv_id}|{turn_idx}".encode("utf-8")
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")
