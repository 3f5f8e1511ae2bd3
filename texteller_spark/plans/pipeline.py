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

from typing import Iterator

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..operators.assemble import assemble_document, assemble_udf
from ..operators.detect import (
    chunk_document,
    decode_page,
    detect_document,
    with_spans,
)
from ..operators.recognize import recognize_span, recognize_spans_udf, recognize_udf
from ..schema import CONTENT_SPAN_SCHEMA, DETECT_CONF_THRESHOLD

__all__ = [
    "detect_stage",
    "recognize_stage",
    "assemble_stage",
    "extract_pages",
    "extract_pages_chunked",
    "span_table",
]

#: deterministic salt for the url-hash repartition (any constant works; the
#: point is decorrelating from upstream layout, not secrecy)
SALT = 0x7E57E11E

_SPAN_COLS = ("span_id", "block_id", "kind", "char_start", "char_end", "confidence", "raw")


def detect_stage(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """(url, html, …) → exploded spans, hash-partitioned by url.

    ONE shuffle for the whole pipeline: ``repartition(p, url)`` both
    balances the scan (urls are unique, so hashing them decorrelates any
    upstream layout skew) and pre-clusters for the final ``groupBy(url)``,
    which then reuses this partitioning — no second exchange.  The explicit
    partition count matters twice: it pins parallelism for the Python-UDF
    stages (AQE's size-based coalescing is blind to per-row UDF cost and
    would otherwise collapse them to a handful of tasks), and it is the
    skew knob at production scale.
    """
    p = partitions or int(pages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    balanced = pages.repartition(p, F.col("url"))
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
    """Recognized spans → one row per url with ordered spans + final text.

    ``span_id`` is RE-DENSIFIED to the 0-based position in the sorted array
    (a free ``transform`` — no shuffle), so assembled output always carries
    dense ordinal ids regardless of which path produced the spans: the
    chunked path rebases ids by char offset (sparse but order-preserving),
    and without this a mixed flagship/chunked output table (CLI ``--resume``
    can interleave both) would break consumers that index by ``span_id``.
    """
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
        .withColumn(
            "spans",
            F.transform(
                "spans",
                lambda s, i: F.struct(
                    i.cast("int").alias("span_id"),
                    *[s[c].alias(c) for c in _SPAN_COLS[1:]],
                    s["content"].alias("content"),
                ),
            ),
        )
        .withColumn("extracted_text", assemble_udf(F.col("spans")))
    )


def span_table(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """Exploded recognized spans — the persisted intermediate table analog
    of the reference's crop sink (S5): one row per span, width-sorted
    recognition batches."""
    return recognize_stage(detect_stage(pages, partitions))


_EXTRACT_RESULT = T.StructType(
    [
        T.StructField("spans", T.ArrayType(CONTENT_SPAN_SCHEMA), False),
        T.StructField("extracted_text", T.StringType(), False),
    ]
)


def extract_page_kernel(html) -> tuple[list[dict], str]:
    """The fused per-page kernel: detect → recognize → assemble, one pass.

    Pure composition of the three tested operator kernels; fusing them into
    one UDF means ONE Arrow round trip per page (html in, spans+text out)
    instead of three round trips of the full span payload — the dominant
    cost at high core counts is Arrow (de)serialization on JVM threads, not
    the Python work itself.
    """
    spans = detect_document(decode_page(html))
    recognized = []
    for s in spans:
        if s.confidence < DETECT_CONF_THRESHOLD:
            continue
        d = s._asdict()
        d["content"] = recognize_span(s.kind, s.raw)
        recognized.append(d)
    return recognized, assemble_document(recognized)


def _extract_batches(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for html_col in it:
        spans_out, text_out = [], []
        for html in html_col:
            spans, text = extract_page_kernel(html)
            spans_out.append(spans)
            text_out.append(text)
        yield pd.DataFrame({"spans": spans_out, "extracted_text": text_out})


extract_udf = pandas_udf(_extract_batches, returnType=_EXTRACT_RESULT)


def _extract_text_batches(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for html_col in it:
        yield pd.Series([extract_page_kernel(h)[1] for h in html_col])


#: text-only variant: the span payload (raw+content, ≈2× the document) never
#: crosses the worker→JVM Arrow feed — the output-side twin of gzip-stored
#: html for pipelines that only consume ``extracted_text``
extract_text_udf = pandas_udf(_extract_text_batches, returnType=T.StringType())


_CHUNK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_id", T.IntegerType(), False),
            T.StructField("off", T.LongType(), False),
            T.StructField("piece", T.StringType(), False),
        ]
    ),
    containsNull=False,
)


def make_chunk_udf(max_chunk_chars: int):
    @pandas_udf(_CHUNK_SCHEMA)
    def chunk_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for html_col in it:
            yield html_col.map(
                lambda b: [
                    {"chunk_id": k, "off": off, "piece": piece}
                    for k, (off, piece) in enumerate(
                        chunk_document(decode_page(b), max_chunk_chars)
                    )
                ]
            )

    return chunk_udf


def recognize_piece_kernel(piece: str, off: int) -> list[dict]:
    """Detect + recognize one chunk; char offsets and span/block ids are
    rebased by the chunk's char offset (monotonic across chunks, so
    block-equality grouping and span ordering match the unchunked scan —
    int32-safe for documents < 2^31 chars, enforced by chunk_document)."""
    out = []
    for s in detect_document(piece):
        if s.confidence < DETECT_CONF_THRESHOLD:
            continue
        d = s._asdict()
        d["span_id"] = s.span_id + off
        d["block_id"] = s.block_id + off
        d["char_start"] = s.char_start + off
        d["char_end"] = s.char_end + off
        d["content"] = recognize_span(s.kind, s.raw)
        out.append(d)
    return out


def _recognize_piece_batches(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    for off_col, piece_col in it:
        yield pd.Series(
            [recognize_piece_kernel(p, int(o)) for o, p in zip(off_col, piece_col)],
            dtype="object",
        )


recognize_piece_udf = pandas_udf(
    _recognize_piece_batches, returnType=T.ArrayType(CONTENT_SPAN_SCHEMA)
)


def extract_pages_chunked(
    pages: DataFrame,
    max_chunk_chars: int = 1 << 20,
    partitions: int | None = None,
) -> DataFrame:
    """W5: oversized-document extraction with bounded per-task work.

    The flagship plan (:func:`extract_pages`) maps whole documents — one
    500 MB pathological page is one unbounded task. This variant splits
    each document at SAFE points (block-tag starts outside suppressed /
    math regions — see :func:`texteller_spark.operators.detect.
    safe_split_points`; the byte-domain analog of the reference's sliced
    detection, predict_det.py:198-297) into ≈``max_chunk_chars`` pieces,
    redistributes the pieces across tasks, detects+recognizes each piece
    independently with offsets re-projected, and reassembles per url.
    Because spans cannot straddle a safe point, the pixel-domain
    overlap+boundary-dedup machinery degenerates: piece-wise detection is
    EXACT (equivalence property-tested against the unchunked kernel,
    including a ≥64 MiB page).

    Cost: one shuffle to spread chunks + the final groupBy(url) — the right
    trade only when documents are huge; the flagship stays shuffle-free for
    the common case. Documents with no safe point in a stretch (plain text)
    degrade to one chunk for that stretch.
    """
    p = partitions or int(pages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    chunk_udf = make_chunk_udf(max_chunk_chars)
    chunks = (
        pages.select("url", F.explode(chunk_udf(F.col("html"))).alias("c"))
        .select("url", "c.*")
        .repartition(p, F.col("url"), F.col("chunk_id"))
    )
    spans = (
        chunks.select(
            "url",
            F.explode_outer(
                recognize_piece_udf(F.col("off"), F.col("piece"))
            ).alias("span"),
        )
        .select("url", "span.*")
    )
    return assemble_stage(spans)


def extract_pages(
    pages: DataFrame, partitions: int | None = None, include_spans: bool = True
) -> DataFrame:
    """Full pipeline: returns (url, spans, extracted_text); with
    ``include_spans=False``, (url, extracted_text) only.

    Doc-granular, SHUFFLE-FREE plan: the whole pipeline is one fused map
    over the scan — extraction needs per-page locality only, which the scan
    already provides.  Parallelism comes from input split planning
    (``spark.sql.files.maxPartitionBytes`` = 32 MB in ``session.py``), not
    from a repartition: shuffling raw html (the widest column in the table)
    costs more than the extraction itself (measured: 23 s to shuffle what
    takes 10 s to extract, at 32 cores / 3 GB).  Pass ``partitions`` to
    opt into a repartition(url) only when the upstream layout is genuinely
    skewed or has too few files.

    Two earlier revisions of this plan are cautionary tales kept in git
    history: explode → groupBy(url) re-grouping (Generate breaks hash-
    partitioning propagation → second exchange, which AQE then coalesced to
    ONE partition — AQE sizes partitions by shuffle bytes and is blind to
    per-row Python-UDF cost), and three chained span-array UDFs (3× Arrow
    round trips of the full span payload).  The exploded span-granular plan
    lives on in :func:`span_table` (checkpointable intermediate,
    width-sorted recognition batches).

    (Design echoes the public literature: UDF-pipeline operator fusion
    ["Optimizing UDF Queries in SQL Data Engines", EDBT'26; "ML Inference
    Pipeline Execution Using Operator Fusion", ICDE'25] and the
    partition-only-when-it-pays rule ["To Partition, or Not to Partition",
    SIGMOD'21] — see PAPERS.md.)
    """
    balanced = pages.repartition(partitions, F.col("url")) if partitions else pages
    if not include_spans:
        return balanced.select(
            "url", extract_text_udf(F.col("html")).alias("extracted_text")
        )
    return balanced.select(
        "url", extract_udf(F.col("html")).alias("res")
    ).select("url", "res.spans", "res.extracted_text")
