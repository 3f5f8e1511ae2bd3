"""Tests for raw-file/fixture sources (S3/S4) and the GLEU metric (A7)."""

import json

from texteller_spark.functions.metrics import corpus_gleu, google_bleu


def test_gleu_identity_and_disjoint():
    assert google_bleu(list("abcd"), list("abcd")) == 1.0
    assert google_bleu(["x"], ["y"]) == 0.0
    assert google_bleu([], []) == 1.0
    assert 0.0 < google_bleu("a b c d e".split(), "a b c x e".split()) < 1.0


def test_gleu_corpus_vs_sentence():
    pairs = [(list("abcd"), list("abcd")), (["x"], ["y"])]
    c = corpus_gleu(pairs)
    assert 0.0 < c < 1.0


def test_extraction_gleu_on_tiny_corpus():
    """Eval-as-test (reference train.py BLEU gate): pure-pipeline extraction
    must score ~1.0 GLEU against generator ground truth."""
    from texteller_spark.operators.assemble import assemble_document
    from texteller_spark.operators.detect import decode_page, detect_document
    from texteller_spark.operators.recognize import recognize_span
    from texteller_spark.sources.pages import expected_extraction, tiny_corpus

    pairs = []
    for page in tiny_corpus():
        _, exp_text = expected_extraction(page["_blocks"])
        spans = detect_document(decode_page(page["html"]))
        rec = [dict(s._asdict(), content=recognize_span(s.kind, s.raw)) for s in spans]
        pairs.append((assemble_document(rec).split(), exp_text.split()))
    assert corpus_gleu(pairs) == 1.0


def test_binaryfile_source(spark, tmp_path):
    from texteller_spark.plans.pipeline import extract_pages
    from texteller_spark.sources.raw import read_pages_binaryfile

    (tmp_path / "a.html").write_bytes(b"<html><body><p>hello $x^{2}$ world</p></body></html>")
    (tmp_path / "b.html").write_bytes(b"<html><body><p>plain text only</p></body></html>")
    (tmp_path / "ignored.txt").write_bytes(b"not a page")

    pages = read_pages_binaryfile(spark, str(tmp_path))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    out = {r["url"].split("/")[-1]: r for r in extract_pages(pages).collect()}
    assert set(out) == {"a.html", "b.html"}
    assert out["a.html"]["extracted_text"] == "hello $x^{2}$ world"


def test_jsonl_fixture_source(spark, tmp_path):
    from texteller_spark.sources.raw import read_formula_fixture

    p = tmp_path / "formulas.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"img_name": f"{i}.png", "formula": f})
            for i, f in enumerate([r"\[a+b\]", r"\mbox {x}"])
        )
    )
    rows = read_formula_fixture(spark, str(p)).orderBy("formula_id").collect()
    assert [(r["formula_id"], r["raw_latex"]) for r in rows] == [
        ("0", r"\[a+b\]"),
        ("1", r"\mbox {x}"),
    ]
