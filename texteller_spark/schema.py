"""Fixed schemas for the extraction engine (no inference anywhere).

The input table shape is authoritative per BASELINE.json ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
an Iceberg table at production scale, parquet at test scale.

The span struct is the Bbox analog of the reference
(``/root/reference/src/models/det_model/Bbox.py:17-26``): reading-order
position becomes ``(block_id, char_start)``; the two math labels
``isolated``/``embedding`` are byte-compatible with the reference's detector
labels (``/root/reference/src/models/det_model/model/infer_cfg.yml:25-27``)
plus ``text`` for OCR-text-block analogs.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Detection confidence threshold — parity with the reference detector's
#: ``draw_threshold: 0.5`` (infer_cfg.yml:2).
DETECT_CONF_THRESHOLD = 0.5

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

#: id semantics (uniform across the flagship, chunked, and span-table
#: paths): ``span_id`` orders spans within a url and, in any ASSEMBLED
#: output (EXTRACTED_SCHEMA), is re-densified to the 0-based ordinal —
#: consumers may index by it. ``block_id`` is an opaque same-block grouping
#: key: equal ⇔ same visual block within the url, monotonic in document
#: order, NOT dense (the whole-doc scan skips ids for empty blocks; the
#: chunked path rebases by char offset) — never treat it as an ordinal.
SPAN_FIELDS = [
    T.StructField("span_id", T.IntegerType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("char_start", T.LongType(), False),
    T.StructField("char_end", T.LongType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("raw", T.StringType(), False),
]

SPAN_SCHEMA = T.StructType(SPAN_FIELDS)
SPANS_ARRAY = T.ArrayType(SPAN_SCHEMA, containsNull=False)

#: span + recognized/normalized payload (post-recognition)
CONTENT_SPAN_SCHEMA = T.StructType(
    SPAN_FIELDS + [T.StructField("content", T.StringType(), False)]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("spans", T.ArrayType(CONTENT_SPAN_SCHEMA), False),
        T.StructField("extracted_text", T.StringType(), False),
    ]
)

#: per-stage, per-partition lineage counters (north rule: checkpointed metrics)
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)
