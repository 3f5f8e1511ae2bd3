"""PDF source: build→extract round trips (escapes, TJ kerning arrays, hex
strings, both framings), malformed degradation, Spark scan shape."""

from __future__ import annotations

import zlib

from texteller_spark.sources.pdf import (
    build_pdf,
    extract_pdf_text,
    read_pages_pdf,
)


def test_roundtrip_both_framings():
    pages = [["hello world", "line two"], ["second page"]]
    for compress in (True, False):
        data = build_pdf(pages, compress=compress)
        assert data.startswith(b"%PDF-")
        assert extract_pdf_text(data) == "hello world\nline two\nsecond page"


def test_escapes_and_special_chars():
    lines = ["with (parens) inside", "back\\slash", "fifty% off: café"]
    got = extract_pdf_text(build_pdf([lines]))
    assert got == "\n".join(lines)


def test_tj_arrays_hex_strings_and_quote_ops():
    content = (
        b"BT [(ker) -120 (ned)] TJ T* <486921> Tj (next) ' ET"
    )
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    # TJ concatenates ignoring kerning; T* breaks the line; hex decodes;
    # ' starts a new line then shows
    assert extract_pdf_text(body) == "kerned\nHi!\nnext"


def test_octal_and_continuation_escapes():
    content = b"BT (A\\101\\12B) Tj (cont\\\ninued) ' ET"
    body = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n" + content + b"\nendstream\n"
    )
    # \101 = 'A', \12 = LF (kept inside the line), escaped EOL vanishes
    assert extract_pdf_text(body) == "A" + "A" + "\nB" + "\ncontinued"


def test_malformed_degrades_to_empty_or_partial():
    assert extract_pdf_text(b"not a pdf") == ""
    assert extract_pdf_text(b"") == ""
    # corrupt Flate stream yields no text but does not raise, and a later
    # intact stream still extracts
    good = b"BT (survivor) Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Filter /FlateDecode /Length 8 >>\nstream\n"
        b"\x78\x9c\xff\xff\xff\xff\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(good)).encode()
        + b" >>\nstream\n" + good + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(body) == "survivor"
    # truncated: stream without endstream
    assert extract_pdf_text(b"%PDF-1.4\nstream\nBT (x) Tj") == ""


def test_length_bounds_payload_even_with_binary_cr_tail_and_keywords():
    # a Flate payload may end in \r or contain b"endstream"; /Length must
    # govern the extent, not EOL trimming or keyword search
    raw = b"BT (exact) Tj ET"
    comp = zlib.compress(raw, 6)
    payload = comp + b"endstream junk that is NOT the terminator"
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(comp)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(body) == "exact"
    # an indirect /Length (n g R) must NOT be taken as a byte count
    content = b"BT (indirect) Tj ET"
    body2 = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 7 0 R >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(body2) == "indirect"


def test_indirect_length_with_multidigit_object_number_not_misparsed():
    # r3 ADVICE: «/Length 70 0 R» let a bare (\d+)(?!\s+\d+\s+R) backtrack
    # to length=7; the anchored regex must yield NO match on any indirect
    # ref regardless of object-number width
    from texteller_spark.sources.pdf import _LENGTH_RE

    assert _LENGTH_RE.search(b"/Length 70 0 R") is None
    assert _LENGTH_RE.search(b"/Length 7 0 R") is None
    assert _LENGTH_RE.search(b"/Length 123 45 R") is None
    assert _LENGTH_RE.search(b"/Length 70").group(1) == b"70"
    assert _LENGTH_RE.search(b"/Length 70 >>").group(1) == b"70"
    # end-to-end: multi-digit indirect ref degrades to keyword search
    content = b"BT (indirect2) Tj ET"
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 70 0 R >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(body) == "indirect2"


def test_compressed_is_smaller_and_equal():
    pages = [["repetition " * 50]]
    a = build_pdf(pages, compress=True)
    b = build_pdf(pages, compress=False)
    assert len(a) < len(b)
    assert extract_pdf_text(a) == extract_pdf_text(b)
    # the compressed body really is Flate (sanity against silent plain)
    assert b"/FlateDecode" in a and zlib


def test_pdf_roundtrip_fuzz():
    """Property: any latin-1 printable text round-trips build→extract
    (escapes, parens, backslashes, high-bit chars) in both framings."""
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    line = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0xFF, blacklist_categories=("Cc",)
        ),
        max_size=60,
    )
    pages = st.lists(st.lists(line, min_size=1, max_size=4), min_size=1, max_size=3)

    @given(pages=pages, compress=st.booleans())
    # regression: this input's Flate output ends in \r, which the old
    # trim-to-endstream heuristic mangled (fixed by honoring /Length)
    @example(pages=[["0", ":", ")«À", ")«À"]], compress=True)
    @settings(max_examples=60, deadline=None)
    def check(pages, compress):
        got = extract_pdf_text(build_pdf(pages, compress=compress))
        expected = [
            s for page in pages for s in (ln.strip() for ln in page) if s
        ]
        assert got == "\n".join(expected)

    check()


def test_spark_pdf_scan_pages_shape(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"doc{i}.pdf").write_bytes(
            build_pdf([[f"document {i} line one", "line two"]], compress=i % 2 == 0)
        )
    got = read_pages_pdf(spark, str(tmp_path)).orderBy("url").collect()
    assert [r["text"] for r in got] == [
        f"document {i} line one\nline two" for i in range(3)
    ]
    assert all(r["html"].startswith(b"%PDF-") for r in got)
    assert got[0]["lang"] is None and got[0]["warc_ts"] is None
