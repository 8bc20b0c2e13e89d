"""Hypothesis fuzzing of the extractors: on ARBITRARY input they must never
raise, and spans must stay valid verbatim slices (the reconstruct
invariant). This is the 10^12-row tolerance contract — one weird payload
must not kill a task."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from univer_ocr_spark.extract import extract_payload, extract_payloads_batch
from univer_ocr_spark.spans import reconstruct, validate_spans

payloads = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)
structured = st.one_of(
    payloads,
    payloads.map(lambda s: "<html><body><p>" + s),
    payloads.map(lambda s: "%PDFISH 612 792\n" + s),
    payloads.map(lambda s: "```\n" + s + "\n```"),
    payloads.map(lambda s: "g a 1 2 3 4\n" + s),
)


@settings(max_examples=400, deadline=None)
@given(structured)
def test_extract_never_raises_and_spans_valid(payload):
    text, spans, kind = extract_payload(payload)
    validate_spans(payload, spans)
    rebuilt = reconstruct(payload, spans,
                          decode_html_entities=(kind == "html"))
    if kind == "pdfish":
        assert rebuilt.replace(" ", "") == text.replace(" ", "")
    else:
        assert rebuilt == text


@settings(max_examples=100, deadline=None)
@given(st.lists(structured, max_size=8))
def test_batch_equals_per_row_on_fuzz(batch):
    got = extract_payloads_batch(batch)
    for i, p in enumerate(batch):
        assert got[i] == extract_payload(p or "")


# entity-ref-shaped fuzz: arbitrary (valid, invalid, surrogate, oversized)
# character references embedded in well-formed HTML — the extractor must
# never raise, decoded text must round-trip via reconstruct, and every
# decodable ref must land as its own one-char span
_refs = st.one_of(
    st.integers(min_value=0, max_value=0x120000).map(lambda n: f"&#{n};"),
    st.integers(min_value=0, max_value=0x120000).map(lambda n: f"&#x{n:x};"),
    st.sampled_from(["&amp;", "&lt;", "&gt;", "&quot;", "&apos;",
                     "&bogus;", "&#;", "&#x;", "&#", "&"]),
)
_html_with_refs = st.lists(
    st.one_of(_refs, st.text(alphabet="abc xyz", max_size=6)),
    max_size=12,
).map(lambda ps: "<html><body><p>" + "".join(ps) + "</p></body></html>")


# attribute-shaped fuzz (r4 quote-aware scanner): random tags whose
# attribute regions mix quotes, '>', '=>' and UNTERMINATED quotes with text
# nodes — never raise, spans always valid, reconstruct round-trips
_attr_chunk = st.one_of(
    st.text(alphabet="ab >='\"<xy/", max_size=10),
    st.sampled_from(['"a>b"', "'c>d'", '"unclosed', "'unclosed", "=>", ">"]),
)
_html_with_attrs = st.lists(
    st.one_of(
        _attr_chunk.map(lambda a: f"<p {a}>"),
        _attr_chunk.map(lambda a: f"<a href={a}>"),
        st.sampled_from(["</p>", "</a>", "<br>", "<div>", "</div>"]),
        st.text(alphabet="mn op", max_size=8),
    ),
    max_size=14,
).map(lambda ps: "<html><body>" + "".join(ps) + "</body></html>")


@settings(max_examples=300, deadline=None)
@given(_html_with_attrs)
def test_quoted_attribute_fuzz_roundtrip(payload):
    text, spans, kind = extract_payload(payload)
    validate_spans(payload, spans)
    assert reconstruct(payload, spans,
                       decode_html_entities=(kind == "html")) == text


@settings(max_examples=300, deadline=None)
@given(_html_with_refs)
def test_entity_refs_fuzz_roundtrip(payload):
    from univer_ocr_spark.constants import decode_entity

    text, spans, kind = extract_payload(payload)
    assert kind == "html"
    validate_spans(payload, spans)
    assert reconstruct(payload, spans, decode_html_entities=True) == text
    for _u, s, e in spans:
        piece = payload[s:e]
        dec = decode_entity(piece)
        if dec is not None and e - s > 1:
            assert len(dec) == 1  # a decoded ref span is exactly one char
