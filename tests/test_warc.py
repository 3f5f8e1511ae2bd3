"""WARC source: round-trip byte identity, malformed-record degradation,
Spark scan → extraction parity with the direct pages path."""

from __future__ import annotations

import datetime
import gzip

from texteller_spark.sources.pages import tiny_corpus
from texteller_spark.sources.warc import build_warc, parse_warc, read_pages_warc


def _rows():
    return [
        (p["url"], p["warc_ts"].replace(tzinfo=None), p["html"])
        for p in tiny_corpus()
    ]


def test_warc_roundtrip_both_framings():
    rows = _rows()
    for gz in (True, False):
        parsed = parse_warc(build_warc(rows, gzip_members=gz))
        assert [(r["url"], r["warc_ts"], r["html"]) for r in parsed] == rows


def test_warc_malformed_records_degrade_rowwise():
    rows = _rows()[:4]
    data = build_warc(rows, gzip_members=True)
    # truncated tail: drop the last 100 bytes — earlier records survive
    parsed = parse_warc(data[:-100])
    assert 0 < len(parsed) < 4
    assert parsed[0]["url"] == rows[0][0]
    # corrupt middle member: records before it survive
    member1 = gzip.compress(b"garbage-not-a-warc-record", 1)
    mixed = build_warc(rows[:2]) + member1 + build_warc(rows[2:])
    parsed = parse_warc(mixed)
    assert [r["url"] for r in parsed[:2]] == [rows[0][0], rows[1][0]]
    # non-response records are skipped
    meta = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    assert parse_warc(meta + build_warc(rows[:1], gzip_members=False)) != []


def test_spark_warc_scan_extracts_byte_identically(spark, tmp_path):
    """WARC shard → read_pages_warc → extract_pages must equal extraction
    over the directly-constructed pages table, byte for byte."""
    from texteller_spark.plans.pipeline import extract_pages
    from texteller_spark.schema import PAGES_SCHEMA

    corpus = tiny_corpus()
    shard = tmp_path / "shard-00000.warc.gz"
    shard.write_bytes(build_warc(_rows(), gzip_members=True))

    via_warc = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(read_pages_warc(spark, str(tmp_path))).collect()
    }
    direct_rows = [
        (p["url"], p["warc_ts"].replace(tzinfo=None), p["html"], p["text"], p["lang"])
        for p in corpus
    ]
    direct = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(
            spark.createDataFrame(direct_rows, PAGES_SCHEMA)
        ).collect()
    }
    assert via_warc == direct
    assert len(via_warc) == len(corpus)


def test_cli_warc_input(spark, tmp_path):
    from texteller_spark.cli import main

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "s0.warc.gz").write_bytes(build_warc(_rows()))
    out = str(tmp_path / "out")
    main(["--input", str(tmp_path / "in"), "--input-format", "warc",
          "--output", out, "--run-id", "w1"])
    got = spark.read.parquet(f"{out}/extracted")
    assert got.count() == len(tiny_corpus())
