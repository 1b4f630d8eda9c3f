"""S7/F13/F16: mysqldump text ingestion — golden line rewrites pinned to
PsqlParser.py:217-257/528-532 semantics, plus a raw-vs-dump differential
(the dump path and the live path must deliver the same rows)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mysql2psql_spark.sources.dump_file import (
    convert_dump_file,
    rewrite_insert_lines,
    skip_column_ddl,
    sql_copy_format,
)

CHANGES = {
    "tables": {
        "reservation_reminder": {
            "name": "reminder",
            "columns": {"resa_id": {"name": "reservation_id"}, "legacy_col": "_SKIP_"},
        },
        "dropped_table": "_SKIP_",
    }
}

DUMP_LINES = [
    # \' -> '' while a real backslash survives; zero-datetime rewritten
    "INSERT INTO \"reservation\" (\"id\", \"note\", \"created_at\") "
    "VALUES (1, 'it\\'s a \\\\ path', '0000-00-00 00:00:00');",
    # renamed table + renamed column
    'INSERT INTO "reservation_reminder" ("id", "resa_id") VALUES (2, 7);',
    # skipped table: dropped entirely
    'INSERT INTO "dropped_table" ("x") VALUES (3);',
    # non-INSERT noise: dropped
    "-- MySQL dump 10.13",
    "SET NAMES utf8;",
]

GOLDEN = [
    (
        "reservation",
        "INSERT INTO \"reservation\" (\"id\", \"note\", \"created_at\") "
        "VALUES  (1, 'it''s a \\\\ path', '2000-01-01 00:00:00');",
    ),
    (
        "reminder",
        'INSERT INTO "reminder" ("id", "reservation_id") VALUES  (2, 7);',
    ),
]


def test_insert_rewrite_golden(spark):
    lines = spark.createDataFrame([(ln,) for ln in DUMP_LINES], ["value"])
    got = [(r["table"], r.insert_sql) for r in rewrite_insert_lines(lines, CHANGES).collect()]
    assert sorted(got) == sorted(GOLDEN)


def test_insert_rewrite_renames_no_cascade(spark):
    """Renames map each extracted token exactly once (the reference's
    single-pass per-column mapping, PsqlParser.py:241-246): a->b and
    b->c on the same table must NOT turn a into c, and an old name equal
    to another column's new name must not double-rename."""
    changes = {
        "tables": {
            "t": {"columns": {"a": {"name": "b"}, "b": {"name": "c"}}},
        }
    }
    lines = spark.createDataFrame(
        [('INSERT INTO "t" ("a", "b", "z") VALUES (1, 2, 3);',)], ["value"]
    )
    got = [(r["table"], r.insert_sql) for r in rewrite_insert_lines(lines, changes).collect()]
    assert got == [("t", 'INSERT INTO "t" ("b", "c", "z") VALUES  (1, 2, 3);')]


def test_convert_dump_file_artifact(spark, tmp_path):
    src = tmp_path / "mysql_dump.sql"
    src.write_text("\n".join(DUMP_LINES) + "\n")
    out = tmp_path / "psql_dump.sql"
    n = convert_dump_file(spark, str(src), str(out), CHANGES)
    assert n == 2
    text = out.read_text()
    # session preamble/epilogue wrap the inserts (D10 shape)
    assert text.index("SET standard_conforming_strings = 'on';") < text.index("INSERT INTO")
    assert text.index("INSERT INTO") < text.index("SET CONSTRAINTS ALL IMMEDIATE;")
    for _, line in GOLDEN:
        assert line in text
    # skip columns dropped post-load (PsqlParser.py:95-96), renamed table
    assert 'ALTER TABLE "reminder" DROP COLUMN IF EXISTS "legacy_col";' in text
    assert "dropped_table" not in text


def test_dump_vs_live_differential(spark, tmp_path):
    """The same source rows through (a) the dump-file rewrite + SQL
    execution and (b) direct DataFrame reads must agree."""
    rows = [(1, "plain"), (2, "it's quoted"), (3, "back\\slash")]
    live = spark.createDataFrame(rows, "id int, note string")

    def mysql_escape(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    src = tmp_path / "dump.sql"
    src.write_text(
        "\n".join(
            f"INSERT INTO \"t\" (\"id\", \"note\") VALUES ({i}, '{mysql_escape(s)}');"
            for i, s in rows
        )
        + "\n"
    )
    out = tmp_path / "psql_dump.sql"
    convert_dump_file(spark, str(src), str(out), None)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, note VARCHAR)")
    for stmt in out.read_text().splitlines():
        if stmt.startswith("INSERT INTO"):
            con.execute(stmt)
    loaded = dict(con.execute("SELECT id, note FROM t").fetchall())
    got = {r.id: r.note for r in live.collect()}
    # Quote escapes round-trip exactly. Backslashes follow the
    # reference's own convention: it keeps mysqldump's doubled \\ while
    # SETting standard_conforming_strings=on (conforming literals read
    # \\ as two chars), so a source backslash loads doubled — pinned
    # here as the reference's dump-path behavior (PsqlParser.py:227,360).
    assert loaded == {i: s.replace("\\", "\\\\") for i, s in got.items()}
    assert loaded[2] == "it's quoted"


def test_sql_copy_format_strip(spark):
    df = spark.createDataFrame(
        [("1::int, 'a', E'x'",), ("'b', E'y'::text",)], ["row_data"]
    )
    got = [r.s for r in df.select(sql_copy_format(F.col("row_data")).alias("s")).collect()]
    # ::casts stripped AND the `', E'` escape-string marker normalized
    # (PsqlParser.py:530-531 applies both replaces to every row)
    assert got == ["1, 'a', 'x'", "'b', 'y'"]


def test_sql_copy_format_e_marker(spark):
    df = spark.createDataFrame([("'a', E'b', E'c'",)], ["row_data"])
    got = df.select(sql_copy_format(F.col("row_data")).alias("s")).head().s
    assert got == "'a', 'b', 'c'"


def test_skip_column_ddl():
    assert skip_column_ddl(CHANGES) == [
        'ALTER TABLE "reminder" DROP COLUMN IF EXISTS "legacy_col";'
    ]
    assert skip_column_ddl(None) == []
