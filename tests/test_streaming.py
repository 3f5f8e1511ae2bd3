"""Structured Streaming lift: same kernels over an unbounded source."""

from texteller_spark.schema import PAGES_SCHEMA
from texteller_spark.sources.pages import tiny_corpus
from texteller_spark.streaming.stream import streaming_extract, streaming_span_rates


def _stream_from_tiny(spark, tmpdir):
    rows = [
        (p["url"], p["warc_ts"].replace(tzinfo=None), p["html"], p["text"], p["lang"])
        for p in tiny_corpus()
        if p["_class"] not in ("oversized", "skew")  # keep the micro-batch small
    ]
    src = f"{tmpdir}/pages_src"
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(src)
    return spark.readStream.schema(PAGES_SCHEMA).parquet(src)


def test_streaming_extract_matches_batch(spark, tmp_path):
    stream = _stream_from_tiny(spark, tmp_path)
    q = (
        streaming_extract(stream)
        .writeStream.format("memory")
        .queryName("spans_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT kind, count(*) AS n FROM spans_out GROUP BY kind").collect()
    counts = {r["kind"]: r["n"] for r in got}
    assert counts.get("text", 0) > 0
    assert counts.get("embedding", 0) > 0
    assert counts.get("isolated", 0) > 0


def test_streaming_windowed_rates(spark, tmp_path):
    stream = _stream_from_tiny(spark, tmp_path)
    q = (
        streaming_span_rates(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("rates_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates_out").collect()
    assert rows
    assert all(r["n_spans"] > 0 for r in rows)
