"""Sequence packing for training-data preparation: map every document onto
its position in the concatenate-then-chunk token stream (the GPT-style
packing model — all docs concatenated in a deterministic order, the stream
cut into fixed ``seq_len`` training sequences).

Reference parity: the reference trains on fixed-budget token sequences
(``MAX_TOKEN_SIZE = 1024``, ``/root/reference/src/models/globals.py:15``,
enforced per sample at train time); packing is the corpus-scale
generalization a training-data pipeline needs — map EVERY document onto
the fixed-length sequence stream instead of truncating per sample.

The core primitive is a DISTRIBUTED exclusive prefix sum over token
counts. The naive Spark spelling — ``sum(n) over (order by id)`` with no
partition clause — collapses the whole table into ONE window partition and
is the classic single-task scale killer. This module uses the two-level
form instead: per-bucket subtotals (tiny frame) get the single-partition
window, then each bucket's documents compute their local running sum in a
``partitionBy(bucket)`` window and add the broadcast bucket prefix. The
only non-parallel step touches #buckets rows, a 10^6-fold reduction at
``bucket_size=2^20``; everything that scales with the corpus is fully
partitioned. Deterministic for a fixed id order, engine-portable (the
DuckDB oracle is the naive one-window SQL — same values, different plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exclusive_prefix_sum", "pack_sequences"]


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive running total). ``order_col``
    must be unique; numeric ids bucket by value range (contiguity is NOT
    required — only order), so the per-bucket windows stay balanced for
    roughly uniform ids. Two shuffles total: the per-bucket aggregate and
    the per-bucket window sort; the bucket-prefix frame (one row per
    bucket) broadcasts back.
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_size)).alias("_psb")
    base = df.select("*", bucket)
    bsum = base.groupBy("_psb").agg(F.sum(value_col).alias("_bs"))
    # one row per bucket: the ONLY unpartitioned window in the plan
    wb = Window.orderBy("_psb").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bsum.select(
        "_psb", F.coalesce(F.sum("_bs").over(wb), F.lit(0)).alias("_bpre")
    )
    wl = (
        Window.partitionBy("_psb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(bpre), "_psb")
        .select(
            "*",
            (
                F.col("_bpre") + F.coalesce(F.sum(value_col).over(wl), F.lit(0))
            ).alias(out_col),
        )
        .drop("_psb", "_bpre")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    seq_len: int = 2048,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Assign every document its place in the packed token stream: the
    input columns plus ``cum_before`` (tokens ahead of this doc),
    ``first_seq``/``last_seq`` (the training sequences the doc lands in —
    equal unless the doc straddles a boundary) and ``seq_offset`` (token
    offset inside ``first_seq``). A writer task can emit its sequences
    from this frame alone — no further coordination. Zero-token docs
    occupy no stream space and land at their boundary position.
    """
    out = exclusive_prefix_sum(
        df, id_col, n_tok_col, out_col="cum_before", bucket_size=bucket_size
    )
    n = F.col(n_tok_col)
    cum = F.col("cum_before")
    return out.select(
        "*",
        F.floor(cum / seq_len).cast("long").alias("first_seq"),
        F.floor((cum + F.greatest(n - 1, F.lit(0))) / seq_len)
        .cast("long")
        .alias("last_seq"),
        (cum % seq_len).cast("long").alias("seq_offset"),
    )
