"""Spark-side engine: session config, extraction pipeline, skew handling,
manifest checkpoint/resume."""
