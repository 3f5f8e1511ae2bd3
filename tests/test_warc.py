"""WARC source: round-trip byte identity, malformed-record degradation,
Spark scan → extraction parity with the direct pages path."""

from __future__ import annotations

import datetime
import gzip

from texteller_spark.sources.pages import tiny_corpus
from texteller_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_warc,
    read_pages_warc,
)


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


def test_corrupt_middle_member_resyncs_and_keeps_tail():
    """A CORRUPT (bit-flipped) gzip member mid-shard must not drop the
    records after it: the walk resyncs at the next gzip magic and yields
    every later intact member (r2 verdict 'What's wrong' #2)."""
    rows = _rows()[:4]
    shards = [build_warc([r], gzip_members=True) for r in rows]
    bad = bytearray(shards[1])
    for off in range(20, min(len(bad) - 12, 220), 7):  # trash the deflate body
        bad[off] ^= 0xFF
    data = shards[0] + bytes(bad) + shards[2] + shards[3]
    urls = [r["url"] for r in parse_warc(data)]
    assert rows[0][0] in urls
    assert rows[2][0] in urls and rows[3][0] in urls  # tail survives
    assert rows[1][0] not in urls  # the corrupt record itself is dropped


def test_warc_dates_are_utc_and_accept_fractional_seconds():
    """WARC-Date is UTC by spec; WARC 1.1 allows fractional seconds and
    offset forms — all must parse to the same naive-UTC value instead of
    silently becoming null (ADVICE warc.py:140)."""
    base = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
    for date, expect in [
        (b"2024-01-01T00:00:00Z", datetime.datetime(2024, 1, 1)),
        (
            b"2024-01-01T00:00:00.123Z",
            datetime.datetime(2024, 1, 1, 0, 0, 0, 123000),
        ),
        (b"2024-01-01T02:30:00+02:30", datetime.datetime(2024, 1, 1)),
        (b"not-a-date", None),
    ]:
        http = b"HTTP/1.1 200 OK\r\n\r\nhi"
        rec = (
            base + b"WARC-Date: " + date
            + b"\r\nContent-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n"
        )
        (parsed,) = parse_warc(rec)
        assert parsed["warc_ts"] == expect, date


def test_member_walk_is_lazy_and_memory_bounded():
    """iter_warc_records must never materialize the decompressed shard:
    peak allocation while draining a many-member shard stays at record
    scale, far below the total decompressed size."""
    import tracemalloc

    big_html = (b"<p>" + b"lorem ipsum dolor sit amet " * 400 + b"</p>")  # ~10.8 KB
    ts = datetime.datetime(2024, 1, 1)
    rows = [(f"https://x.test/{i}", ts, big_html) for i in range(600)]
    data = build_warc(rows, gzip_members=True)  # ≈6.5 MB decompressed
    decompressed_total = len(big_html) * len(rows)

    # laziness: the first record arrives without walking the whole shard
    it = iter_warc_records(data)
    assert next(it)["url"] == rows[0][0]

    tracemalloc.start()
    n = sum(1 for _ in iter_warc_records(data))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == len(rows)
    # whole-shard parse would hold >= decompressed_total; record-granular
    # parsing stays an order of magnitude under it
    assert peak < decompressed_total / 5, (peak, decompressed_total)


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


def test_wet_round_trip_and_type_filtering(spark, tmp_path):
    """WET conversion records round-trip through read_text_wet (text
    filled, html null); a mixed shard is split correctly — the response
    reader never yields conversion records and vice versa."""
    import datetime as dt

    from texteller_spark.sources.warc import build_wet, read_text_wet

    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    wet_rows = [
        ("https://a.example/x", ts, "extracted text one\nline two"),
        ("https://b.example/y", ts, "päge twö ünicode"),
    ]
    warc_rows = [("https://c.example/z", ts, b"<html>resp</html>")]
    mixed = build_warc(warc_rows) + build_wet(wet_rows)
    (tmp_path / "s0.warc.gz").write_bytes(mixed)

    wet = {
        r["url"]: (r["text"], r["html"])
        for r in read_text_wet(spark, str(tmp_path)).collect()
    }
    assert wet == {u: (t, None) for u, _, t in wet_rows}

    resp = {
        r["url"]: bytes(r["html"])
        for r in read_pages_warc(spark, str(tmp_path)).collect()
    }
    assert resp == {u: h for u, _, h in warc_rows}
