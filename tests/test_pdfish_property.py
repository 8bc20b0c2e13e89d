"""Property test on RANDOM well-formed glyph streams (not generator
layouts): the vectorized batch path must equal the per-payload parser on
arbitrary coordinates — orientation votes, column splits, margin strips,
band merges and space rules all have to tie out bit-for-bit."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from univer_ocr_spark.extract.pdfish_batch import extract_pdfish_many
from univer_ocr_spark.extract.pdfish_extract import extract_pdfish
from univer_ocr_spark.spans import validate_spans

coord = st.integers(min_value=0, max_value=1000)
ext = st.integers(min_value=0, max_value=40)
ch = st.sampled_from("abcxyz09.!")

glyph = st.tuples(ch, coord, coord, ext, ext)
page = st.tuples(
    st.integers(min_value=1, max_value=1200),  # page_w
    st.integers(min_value=1, max_value=1200),  # page_h
    st.lists(glyph, min_size=0, max_size=60),
)


def payload_of(p) -> str:
    w, h, glyphs = p
    recs = "".join(f"g {c} {x} {y} {wd} {ht}\n" for c, x, y, wd, ht in glyphs)
    return f"%PDFISH {w} {h}\n{recs}"


@settings(max_examples=300, deadline=None)
@given(st.lists(page, min_size=1, max_size=6))
def test_batch_equals_slow_on_random_glyphs(pages):
    payloads = [payload_of(p) for p in pages]
    batch = extract_pdfish_many(payloads)
    for i, p in enumerate(payloads):
        slow = extract_pdfish(p)
        assert batch[i] == slow, f"payload {i}: {p[:120]!r}"
        validate_spans(p, slow[1])
