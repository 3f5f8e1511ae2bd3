"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (pages derived
deterministically from the sf0.001 ``documents`` parquet → detect →
recognize/normalize → assemble). ``queries()``/``oracle_sql()`` expose the
operator catalog from ``texteller_spark/plans/queries.py``; the driver
compares each pair via DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> None:
    from texteller_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship extraction over pages derived from /root/testdata/sf0.001."""
    _prepare(spark)
    from texteller_spark.plans.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from texteller_spark.plans.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from texteller_spark.plans.queries import ORACLES

    return dict(ORACLES)
