"""univer_ocr_spark — PySpark-native main-content extraction engine.

A from-scratch re-expression of the extraction capability of the reference
(KerkDovan/univer-ocr, /root/reference): payload -> layout segmentation ->
block/line ordering -> main-content text with per-unit character-span
offsets, verified against a by-construction golden generator
(ref: web_app/components/image_generator/generate.py:103-224 emits
pixel-perfect ground truth; web_app/components/interpreter/interpreter.py:110-171
is the zero-ML oracle — our generator/oracle pair plays the same roles over
transcript turns instead of rendered pixels).

Architecture is Spark-first: one turn = one row; all per-turn parsing runs
inside Arrow-batched ``mapInPandas`` stages; cross-turn structure
(partitioning, salting, ordering, checkpoint/resume) is DataFrame-level.
"""

EXTRACTION_VERSION = "1.1.0"  # r3: spanning-block column splitting + numeric char refs

__all__ = ["EXTRACTION_VERSION"]
