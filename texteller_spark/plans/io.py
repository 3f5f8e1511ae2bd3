"""Table IO seam: one code path for the sink/source format.

The production posture (SURVEY.md / north rule) is Iceberg — bucketed input
table, ``writeTo().append()`` sinks, snapshot-isolated resume. The sandbox
has no Iceberg runtime jar, so everything runs on parquet projections whose
plan properties (partition pruning, co-partitioned layout, append+anti-join
resume) are pinned equivalent in ``tests/test_plan_quality.py``. This module
is the seam that makes the swap a config change instead of a code change:
every checkpoint/sink call routes through :func:`append_table` /
:func:`read_table`, and ``SPARK_GRAFT_TABLE_FORMAT=iceberg`` switches the
whole engine to ``writeTo()`` table identifiers (skipped-if-unavailable
tested in-sandbox).

Targets are format-interpreted: a filesystem path for ``parquet``, a
catalog table identifier (``cat.db.tbl``) for ``iceberg``.
:func:`table_target` builds the child-table name for each convention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["table_format", "table_target", "append_table", "read_table"]


def table_format(fmt: str | None = None) -> str:
    """Resolve the active table format: explicit arg beats the
    ``SPARK_GRAFT_TABLE_FORMAT`` env (default ``parquet``)."""
    out = (fmt or os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")).lower()
    if out not in ("parquet", "iceberg"):
        raise ValueError(f"unsupported table format: {out!r}")
    return out


def table_target(base: str, name: str, fmt: str | None = None) -> str:
    """Child-table target under ``base``: ``base/name`` for path-addressed
    parquet, ``base.name`` for catalog-addressed Iceberg."""
    return f"{base}/{name}" if table_format(fmt) == "parquet" else f"{base}.{name}"


def append_table(df: DataFrame, target: str, fmt: str | None = None) -> None:
    """Append ``df`` to ``target`` (create on first write).

    parquet: ``write.mode('append').parquet(path)``. iceberg:
    ``writeTo(tbl).append()`` — Iceberg commits are snapshot-isolated, so a
    crashed job never leaves a half-visible append (the resume anti-join in
    ``checkpoint.resume_pending`` reads only committed snapshots; parquet
    approximates this with directory-level atomicity of the Spark commit
    protocol)."""
    if table_format(fmt) == "parquet":
        df.write.mode("append").parquet(target)
        return
    if df.sparkSession.catalog.tableExists(target):
        df.writeTo(target).append()
    else:
        df.writeTo(target).using("iceberg").create()


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame | None:
    """Read ``target``; None when it does not exist yet (first run)."""
    if table_format(fmt) == "parquet":
        try:
            return spark.read.parquet(target)
        except Exception:
            return None
    if not spark.catalog.tableExists(target):
        return None
    return spark.read.table(target)
