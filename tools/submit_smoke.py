"""Deployment-contract smoke: the extraction pipeline via
``spark-submit --py-files <pipeline.zip>`` (BASELINE.json north_star).

Run with:
    ZIP=$(python -c "from univer_ocr_spark.packaging import build_zip; print(build_zip('/tmp/pipeline.zip'))")
    spark-submit --master local[8] --py-files "$ZIP" tools/submit_smoke.py

Exits non-zero unless every extracted turn matches its golden.
"""

import sys

from pyspark.sql import SparkSession, functions as F

from univer_ocr_spark.generator.transcripts import transcripts_df
from univer_ocr_spark.spark.pipeline import run_extraction

spark = SparkSession.builder.getOrCreate()
df = transcripts_df(spark, 20, with_goldens=True, partitions=4)
out = run_extraction(df)
bad = out.filter(F.col("extracted_text") != F.col("gold_text")).count()
n = out.count()
print(f"SUBMIT_RESULT turns={n} mismatches={bad}")
sys.exit(0 if bad == 0 and n > 0 else 1)
