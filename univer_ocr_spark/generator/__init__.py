"""Deterministic golden-by-construction transcript generator.

Analog of the reference's synthetic page generator which renders payloads and
emits pixel-perfect ground truth simultaneously
(ref: web_app/components/image_generator/generate.py:103-224). Here the
generator assembles each turn's payload from known main-content and
boilerplate pieces and records the exact golden text + character spans as it
serializes — goldens are *by construction*, never produced by running the
extractor.
"""
