"""End-to-end test of the spark-submit job surface (cli.main)."""

from texteller_spark.cli import main


def test_cli_synth_extract_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    # initial run: synthesize 60 pages, extract, write results + metrics
    main(["--synth", "60", "--output", out, "--run-id", "r1"])
    extracted = spark.read.parquet(f"{out}/extracted")
    assert extracted.count() == 60
    assert set(extracted.columns) >= {"url", "spans", "extracted_text"}
    metrics = spark.read.parquet(f"{out}/_metrics")
    assert metrics.filter("stage like 'assemble:r1%'").count() > 0
    assert metrics.select("n_rows").groupBy().sum().head()[0] == 60

    # resume run over the same corpus: everything already done → no new rows
    main(["--synth", "60", "--output", out, "--run-id", "r2", "--resume"])
    assert spark.read.parquet(f"{out}/extracted").count() == 60


def test_cli_chunked_matches_whole_document(spark, tmp_path):
    """--chunk-chars (W5) through the job surface: same urls, same bytes."""
    a, b = str(tmp_path / "whole"), str(tmp_path / "chunked")
    main(["--synth", "40", "--output", a, "--run-id", "r1"])
    main(["--synth", "40", "--output", b, "--run-id", "r1", "--chunk-chars", "1500"])
    whole = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(f"{a}/extracted").collect()
    }
    chunked = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(f"{b}/extracted").collect()
    }
    assert chunked == whole
