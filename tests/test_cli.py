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
