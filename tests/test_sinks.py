"""Sink tests: reference CSV dialect round-trip + orchestration."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2psql_spark.plans.orchestration import PhaseTimer, run_concurrent
from mysql2psql_spark.sinks import write_reference_csv
from mysql2psql_spark.sources import load_table
from tests.conftest import SF_DIR


def test_reference_csv_dialect(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "it's quoted", None), (2, "plain", 3.5)], "id int, s string, v double"
    )
    path = str(tmp_path / "t")
    copy_cmd = write_reference_csv(df, path, single_file=True)
    assert "FORMAT CSV, QUOTE '''', DELIMITER ',', NULL 'NULL'" in copy_cmd
    assert '"id", "s", "v"' in copy_cmd
    text = spark.read.text(path).collect()
    lines = sorted(r.value for r in text)
    # single-quote doubling + NULL literal (PsqlParser.py:374-383 semantics)
    assert lines == ["1,'it''s quoted',NULL", "2,plain,3.5"]


def test_csv_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation")
    write_reference_csv(df, path)
    back = (
        spark.read.option("quote", "'")
        .option("nullValue", "NULL")
        .schema(df.schema)
        .csv(path)
    )
    assert back.count() == df.count()
    assert {r.n_name for r in back.collect()} == {r.n_name for r in df.collect()}


def test_run_concurrent_and_timer(spark):
    timer = PhaseTimer()
    with timer.phase("extract"):
        jobs = [
            (t, lambda t=t: load_table(spark, SF_DIR, t).count())
            for t in ("region", "nation", "customer")
        ]
        results = run_concurrent(spark, jobs, max_parallel=3)
    assert results == {"region": 5, "nation": 25, "customer": 150}
    assert timer.report()["extract"] > 0
