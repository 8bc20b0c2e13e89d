"""Quote-aware HTML tag scanning (r4): '>' inside quoted attribute values
must not terminate the tag (HTML5 attribute-value tokenizer states); an
unterminated quote degrades to text, never a crash. The r3 verdict's #1
real-web robustness gap — previously invisible because the generated
dialect never emitted '>' in attributes (now it does, see html_gen._attrs).
"""

from __future__ import annotations

from random import Random

from univer_ocr_spark.extract.html_extract import extract_html
from univer_ocr_spark.generator.html_gen import generate_html
from univer_ocr_spark.spans import reconstruct, validate_spans


def _wrap(body: str) -> str:
    return f"<html><body>{body}</body></html>"


def test_gt_in_double_quoted_attribute():
    payload = _wrap('<p onclick="if (a>1) f()">hello world</p>')
    text, spans = extract_html(payload)
    assert text == "hello world"
    assert len(spans) == 1
    validate_spans(payload, spans)


def test_gt_lt_in_single_quoted_attribute():
    payload = _wrap("<p data-x='a<b>c'>t1 t2</p>")
    text, spans = extract_html(payload)
    assert text == "t1 t2"
    validate_spans(payload, spans)


def test_arrow_fn_in_dropped_boilerplate_tag():
    payload = _wrap(
        '<nav data-fn="(x) => x>0"><a href="/">home</a></nav><p>keep</p>'
    )
    text, _spans = extract_html(payload)
    assert text == "keep"


def test_mixed_quotes_inside_value():
    payload = _wrap("<p onclick=\"go('x>y')\" data-q='say \"a>b\"'>body</p>")
    text, _spans = extract_html(payload)
    assert text == "body"


def test_unterminated_quote_degrades_to_text_not_crash():
    # the '<p unclosed="...' can never match a tag; it falls through as a
    # text node inside the outer block — tolerated, spans stay valid
    payload = _wrap('<div>ok <p bad="unclosed>lost</div>')
    text, spans = extract_html(payload)
    validate_spans(payload, spans)
    assert "ok" in text
    assert reconstruct(payload, spans, decode_html_entities=True) == text


def test_generator_emits_attr_payloads_and_goldens_roundtrip():
    seen_attr = False
    for seed in range(120):
        rng = Random(seed)
        payload, gold_text, gold_spans, _blocks = generate_html(rng)
        seen_attr = seen_attr or (" => " in payload or ">0" in payload)
        text, spans = extract_html(payload)
        assert text == gold_text, seed
        assert spans == gold_spans, seed
        validate_spans(payload, spans)
        assert reconstruct(payload, spans, decode_html_entities=True) == text
    assert seen_attr  # the dialect actually exercises the scanner
