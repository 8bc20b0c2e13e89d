"""Numeric character references (&#NNN; / &#xHH;) through the HTML
extractor: decode to one char with their own span, undecodable refs stay
verbatim, and reconstruct(..., decode_html_entities=True) round-trips."""

from __future__ import annotations

from univer_ocr_spark.constants import decode_entity
from univer_ocr_spark.extract.html_extract import extract_html
from univer_ocr_spark.spans import reconstruct, validate_spans


def _wrap(body: str) -> str:
    return f"<html><body><p>{body}</p></body></html>"


def test_numeric_refs_decode_with_own_spans():
    payload = _wrap("caf&#233; &#x2019;quote&#X2019; &amp; x")
    text, spans = extract_html(payload)
    assert text == "café ’quote’ & x"
    validate_spans(payload, spans)
    assert reconstruct(payload, spans, decode_html_entities=True) == text
    # each decoded ref is its own span over the raw reference
    ref_slices = [payload[s:e] for _u, s, e in spans if e - s > 1 and payload[s] == "&"]
    assert ref_slices == ["&#233;", "&#x2019;", "&#X2019;", "&amp;"]


def test_undecodable_refs_stay_verbatim():
    # surrogate, beyond U+10FFFF, bare '&#', and a non-ref ampersand
    body = "a&#xD800;b&#1114112;c&# d&e"
    payload = _wrap(body)
    text, spans = extract_html(payload)
    assert text == body
    validate_spans(payload, spans)
    assert reconstruct(payload, spans, decode_html_entities=True) == body


def test_decode_entity_contract():
    assert decode_entity("&#65;") == "A"
    assert decode_entity("&#x41;") == "A"
    assert decode_entity("&#x10FFFF;") == "\U0010FFFF"
    assert decode_entity("&amp;") == "&"
    for bad in ("&#xD800;", "&#xDFFF;", "&#1114112;", "&#;", "&#x;", "&bogus;", "A"):
        assert decode_entity(bad) is None, bad
    # int()-accepted forms the extractor regex rejects must NOT decode
    # (ADVICE r3: '&#6_5;' stayed verbatim in extracted_text but decoded in
    # reconstruct, breaking the audit invariant). Mirror _ENT_RE exactly.
    for sneaky in ("&#6_5;", "&# 65;", "&#+65;", "&#-65;", "&#65 ;",
                   "&#x4_1;", "&#x 41;", "&#x+41;", "&#٦٥;", "&#65\n;"):
        assert decode_entity(sneaky) is None, sneaky


def test_int_accepted_forms_match_extract_and_reconstruct():
    # the invariant itself: whatever extract keeps verbatim, reconstruct
    # must too (and vice versa for decoded refs)
    for body in ("&#6_5;", "&# 65;", "&#+65;", "&#65;", "&#x41;"):
        payload = _wrap(body)
        text, spans = extract_html(payload)
        assert reconstruct(payload, spans, decode_html_entities=True) == text


def test_br_splits_units_without_phantom_chars():
    payload = _wrap("alpha<br>beta gamma<br><br>delta<br>")
    text, spans = extract_html(payload)
    assert text == "alpha\nbeta gamma\ndelta"
    validate_spans(payload, spans)
    # three units, spans verbatim (newlines are unit joins, not characters)
    assert {u for u, _s, _e in spans} == {0, 1, 2}
    assert reconstruct(payload, spans, decode_html_entities=True) == text


def test_br_in_dropped_subtree_and_outside_blocks_is_inert():
    payload = ("<html><head><title>x<br>y</title></head><body><br>"
               "<p>one</p><br></body></html>")
    text, spans = extract_html(payload)
    assert text == "one"
    validate_spans(payload, spans)
