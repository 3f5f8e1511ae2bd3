"""The flagship extraction plan: pages → spans → recognized → assembled.

Spark-first re-expression of the reference's mix_inference dataflow
(``/root/reference/src/models/utils/mix_inference.py:136-264``):

::

    pages (scan: url, warc_ts, html, text, lang)
      → repartition(P, xxhash64(url, salt) % P)      # salted skew discipline
      → withColumn(spans = detect_udf(html))          # D1+D2 fused (Arrow)
      → filter(confidence ≥ 0.5)                      # P1, Catalyst-visible
      → explode(spans)                                # span-granular skew
      → sortWithinPartitions(length(raw))             # width-sorted batching (W4)
      → withColumn(content = recognize_udf(kind,raw)) # R1+R2+normalize (Arrow)
      → groupBy(url).agg(array_sort(collect_list(...)))  # deterministic order
      → withColumn(extracted_text = assemble_udf(spans)) # ordered fold (A2)

Two exchanges total: the initial salted repartition and the final groupBy.
``array_sort(collect_list(struct(span_id first, …)))`` makes assembly
independent of partition count / arrival order (determinism invariant the
scaling test relies on, SURVEY.md §7.3).

At production scale the scan is an Iceberg table bucketed by ``url`` hash;
in-sandbox the same plan runs over parquet. Per-partition lineage counters
and resumable checkpointing live in ``checkpoint.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.assemble import assemble_udf
from ..operators.detect import with_spans
from ..operators.recognize import recognize_udf

__all__ = ["detect_stage", "recognize_stage", "assemble_stage", "extract_pages"]

#: deterministic salt for the url-hash repartition (any constant works; the
#: point is decorrelating from upstream layout, not secrecy)
SALT = 0x7E57E11E

_SPAN_COLS = ("span_id", "block_id", "kind", "char_start", "char_end", "confidence", "raw")


def detect_stage(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """(url, html, …) → exploded spans, salted-repartitioned by url hash."""
    p = partitions or int(pages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    balanced = pages.repartition(p, F.pmod(F.xxhash64(F.col("url"), F.lit(SALT)), F.lit(p)))
    # explode_outer keeps span-less pages (empty/undecodable html) so they
    # reach the output and the resume checkpoint — otherwise every re-run
    # would re-process them forever.
    return (
        with_spans(balanced)
        .select("url", F.explode_outer("spans").alias("span"))
        .select("url", "span.*")
    )


def recognize_stage(spans: DataFrame) -> DataFrame:
    """Exploded spans → + content. Width-sorted batching: sorting each
    partition by payload length keeps Arrow batches size-homogeneous (the
    reference sorts recognition crops by aspect ratio for the same reason)."""
    return spans.sortWithinPartitions(F.length("raw")).withColumn(
        "content", recognize_udf(F.col("kind"), F.col("raw"))
    )


def assemble_stage(recognized: DataFrame) -> DataFrame:
    """Recognized spans → one row per url with ordered spans + final text."""
    # collect_list skips nulls → span-less urls yield spans=[] and text="".
    return (
        recognized.groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("kind").isNotNull(),
                        F.struct(*_SPAN_COLS, "content"),
                    )
                )
            ).alias("spans")
        )
        .withColumn("extracted_text", assemble_udf(F.col("spans")))
    )


def extract_pages(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """Full pipeline: returns (url, spans, extracted_text)."""
    return assemble_stage(recognize_stage(detect_stage(pages, partitions)))
