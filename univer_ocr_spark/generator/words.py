"""Seeded word/sentence soup (analog of the reference's fake-text generator,
ref: web_app/components/image_generator/generate.py:271-279 — random
char-soup words via ``textwrap``; we add determinism via ``random.Random``).
"""

from __future__ import annotations

from random import Random

from univer_ocr_spark.constants import ALPHABET

# Word characters: letters + digits only (punctuation appears as separate
# short tokens so payload structure chars never leak into content words).
_WORD_CHARS = [c for c in ALPHABET if c.isalnum()]
_PUNCT_TOKENS = [".", ",", "!", "?", ":", ";", "-"]


def word(rng: Random, lo: int = 2, hi: int = 10) -> str:
    n = rng.randint(lo, hi)
    return "".join(rng.choice(_WORD_CHARS) for _ in range(n))


def sentence(rng: Random, n_words_lo: int = 3, n_words_hi: int = 12) -> str:
    n = rng.randint(n_words_lo, n_words_hi)
    parts = [word(rng) for _ in range(n)]
    if rng.random() < 0.5:
        parts[-1] = parts[-1] + rng.choice(_PUNCT_TOKENS)
    return " ".join(parts)


def ascii_word(rng: Random, lo: int = 3, hi: int = 8) -> str:
    """Pure-ASCII lowercase word (for tag ids, tool names, urls)."""
    n = rng.randint(lo, hi)
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))
