"""Oracle-vs-golden equivalence (pure Python, no Spark).

The generator emits goldens by construction; the oracle extractor must
reproduce them exactly — the same relationship as the reference's
``interpret()`` decoding ground-truth layers back to the text the generator
drew (ref: views/main.py:88-99, interpreter.py:110-171).
"""

from __future__ import annotations

from collections import Counter
from random import Random

import pytest

from univer_ocr_spark.extract import extract_payload, sniff
from univer_ocr_spark.generator.html_gen import generate_html
from univer_ocr_spark.generator.markup_gen import generate_markup
from univer_ocr_spark.generator.pdfish_gen import generate_pdfish
from univer_ocr_spark.generator.transcripts import build_turn, conv_id_of
from univer_ocr_spark.spans import reconstruct, validate_spans

N = 300


@pytest.mark.parametrize(
    "gen,kind",
    [(generate_html, "html"), (generate_pdfish, "pdfish"), (generate_markup, "toolmarkup")],
)
def test_archetype_oracle_matches_golden(gen, kind):
    for seed in range(N):
        rng = Random(seed)
        payload, gold_text, gold_spans, _blocks = gen(rng)
        assert sniff(payload) == kind, f"seed={seed}"
        text, spans, k = extract_payload(payload)
        assert k == kind
        assert text == gold_text, f"{kind} seed={seed}"
        assert spans == gold_spans, f"{kind} seed={seed}"
        validate_spans(payload, spans)
        rebuilt = reconstruct(payload, spans,
                              decode_html_entities=(kind == "html"))
        if kind == "pdfish":
            # word spaces are *inferred* from glyph gaps (no payload char),
            # so reconstruction matches modulo spaces
            assert rebuilt.replace(" ", "") == text.replace(" ", ""), f"seed={seed}"
        else:
            assert rebuilt == text, f"{kind} seed={seed}"


def test_extract_single_matches_golden():
    """S10 single-payload entry wraps the same oracle (ref: predict.py:44-46)."""
    from univer_ocr_spark.extract import extract_single

    for c in range(10):
        row = build_turn(conv_id_of(c), 0)
        d = extract_single(row["text"])
        assert d["extracted_text"] == row["gold_text"]
        assert d["spans"] == row["gold_spans"]
        assert d["kind"] == row["payload_kind"]
        assert d["n_spans"] == len(row["gold_spans"])


def test_turns_deterministic_and_consistent():
    kinds = Counter()
    for c in range(40):
        cid = conv_id_of(c)
        for t in range(5):
            row1 = build_turn(cid, t)
            row2 = build_turn(cid, t)
            assert row1 == row2  # pure function of the key
            kinds[row1["payload_kind"]] += 1
            text, spans, kind = extract_payload(row1["text"])
            assert kind == row1["payload_kind"]
            assert text == row1["gold_text"]
            assert [
                {"unit": u, "start": s, "end": e} for (u, s, e) in spans
            ] == row1["gold_spans"]
    # all three archetypes exercised
    assert set(kinds) == {"html", "pdfish", "toolmarkup"}
