"""pdf_raw sources — SURVEY.md §2.1 S1.

Two ways documents enter the engine:

* `read_pdf_dir`: a directory tree of *.pdf files via Spark's
  binaryFile source (path pruning + modifiedAfter predicates push into
  the file index; content arrives as one binary column, no Python I/O).
* `read_pdf_raw`: a parquet/Iceberg-style table already shaped
  (doc_id, pdf_bytes).

Both normalize to the pdf_raw contract consumed by
operators/extract.extract_spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pdf_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.pdf",
    modified_after: str | None = None,
) -> DataFrame:
    """Directory of PDF files -> pdf_raw(doc_id, pdf_bytes).

    doc_id = file path (unique, stable, and lineage-friendly)."""
    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    df = reader.load(path)
    return df.select(
        F.col("path").alias("doc_id"), F.col("content").alias("pdf_bytes")
    )


def read_pdf_raw(spark: SparkSession, path: str) -> DataFrame:
    """Parquet table with (doc_id, pdf_bytes) columns (extra columns
    pass through untouched; extract_spans selects what it needs)."""
    df = spark.read.parquet(path)
    return df.withColumn("doc_id", F.col("doc_id").cast("string"))
