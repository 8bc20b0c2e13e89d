"""Stage-level tests against gold_blocks — each extraction stage verified in
isolation against the generator's structural ground truth, mirroring the
reference's per-mode curriculum where every model trains against its own
golden layer (ref: my_model/train.py:100-106; SURVEY.md §5.3)."""

from __future__ import annotations

from random import Random

from univer_ocr_spark.extract.html_extract import parse_blocks
from univer_ocr_spark.extract.markup_extract import extract_markup
from univer_ocr_spark.extract.pdfish_extract import extract_pdfish
from univer_ocr_spark.generator.html_gen import generate_html
from univer_ocr_spark.generator.markup_gen import generate_markup
from univer_ocr_spark.generator.pdfish_gen import generate_pdfish

N = 200


def test_html_block_segmentation_and_classification():
    for seed in range(N):
        payload, _gt, _gs, gold_blocks = generate_html(Random(seed))
        got_main = []
        for tag, is_main, nodes in parse_blocks(payload):
            if not is_main:
                continue
            real = [n for n in nodes if n is not None]  # <br> markers
            got_main.append((tag, real[0][0], real[-1][1]))
        want_main = [
            (kind, start, end) for (_b, _l, kind, is_main, start, end) in gold_blocks
            if is_main
        ]
        assert got_main == want_main, f"seed={seed}"


def test_pdfish_line_detection():
    for seed in range(N):
        payload, gt, _gs, gold_blocks = generate_pdfish(Random(seed))
        text, spans = extract_pdfish(payload)
        want_lines = [b for b in gold_blocks if b[3]]  # is_main
        n_units = spans[-1][0] + 1 if spans else 0
        assert n_units == len(want_lines), f"seed={seed}"
        # each unit's glyph offsets stay within the gold line's extent
        for unit, (_b, _l, _k, _m, lo, hi) in enumerate(want_lines):
            offs = [(s, e) for (u, s, e) in spans if u == unit]
            assert min(s for s, _ in offs) == lo, f"seed={seed} unit={unit}"
            assert max(e for _, e in offs) == hi, f"seed={seed} unit={unit}"


def test_markup_line_classification():
    for seed in range(N):
        payload, _gt, _gs, gold_blocks = generate_markup(Random(seed))
        text, spans = extract_markup(payload)
        content = [b for b in gold_blocks if b[3]]
        n_units = spans[-1][0] + 1 if spans else 0
        assert n_units == len(content), f"seed={seed}"
        for unit, (_b, _l, _k, _m, lo, hi) in enumerate(content):
            offs = [(s, e) for (u, s, e) in spans if u == unit]
            assert all(lo <= s and e <= hi for s, e in offs), f"seed={seed}"
