"""Raw-file and fixture sources (SURVEY.md §2.1 S1–S4 analogs).

* :func:`read_pages_binaryfile` — directory/glob scan of raw page files via
  Spark's ``binaryFile`` source (the reference's per-file image scan,
  ``det_model/preprocess.py:6-23`` + dir glob ``infer_det.py:23-51``);
  file listing, pruning, and parallel split planning are the engine's job.
* :func:`read_formula_fixture` — JSONL fixture scan (the reference's HF
  datasets loader over ``formulas.jsonl``, ``train/dataset/loader.py:34-50``)
  as a plain ``spark.read.json`` with an explicit schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_pages_binaryfile", "read_formula_fixture"]


def read_pages_binaryfile(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan raw ``.html`` files into the authoritative pages shape.

    ``url`` = file path, ``warc_ts`` = file modification time, ``html`` =
    raw bytes; ``text``/``lang`` are unknown at scan time (null) — exactly
    the shape :func:`texteller_spark.plans.pipeline.extract_pages` expects.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .load(path_glob)
        .select(
            F.col("path").alias("url"),
            F.col("modificationTime").alias("warc_ts"),
            F.col("content").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


FORMULA_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("img_name", T.StringType(), False),
        T.StructField("formula", T.StringType(), False),
    ]
)


def read_formula_fixture(spark: SparkSession, jsonl_path: str) -> DataFrame:
    """JSONL fixture → (formula_id, raw_latex); explicit schema, no
    inference (the engine's no-schema-inference discipline)."""
    return (
        spark.read.schema(FORMULA_FIXTURE_SCHEMA)
        .json(jsonl_path)
        .select(
            F.regexp_replace("img_name", r"\.png$", "").alias("formula_id"),
            F.col("formula").alias("raw_latex"),
        )
    )
