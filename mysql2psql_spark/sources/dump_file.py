"""S7: mysqldump-file ingestion — the reference's (deprecated) second
mode of operation, where data arrives as a SQL text dump instead of a
live connection (generate_dump_from_mysql_dump,
/root/reference/libs/PsqlParser.py:73-98).

Spark-first shape: `spark.read.text` over the dump (splittable scan —
a 100 TB dump reads as parallel line partitions), then the whole rewrite
chain as Column expressions (codegen'd string ops, no Python per line):

- F13 INSERT-line rewrite (PsqlParser.py:217-257): protect ``\\\\``,
  MySQL ``\\'`` escapes -> SQL-standard ``''``, zero-date/datetime ->
  2000-01-01 (note: the dump path's zero-date convention deliberately
  differs from the raw path's F7/F8 NULL/1900 semantics — both are
  pinned to their respective reference code paths), schema-change
  renames applied to table and column names, `_SKIP_`-ed tables dropped,
  non-INSERT lines dropped.
- F16 legacy \\copy formatting strip (sql_copy_format,
  PsqlParser.py:528-532).

The per-table rename/skip dispatch compiles the (catalog-sized)
schema_changes dict into a WHEN chain on the extracted table name —
rule lookup costs no join and no shuffle; the whole conversion is a
single narrow map over the text scan.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# the reference's own protector token (PsqlParser.py:227)
_SENTINEL = "WUBWUBREALSLASHWUB"
_INSERT_RE = r'^INSERT INTO "([\w\d]+)"([\w\W]+)VALUES([\w\W]+);$'


def _normalize_line(value: Column) -> Column:
    """The decode/strip/replace chain of PsqlParser.py:226-230, literal
    (non-regex) replaces throughout, in the reference's exact order."""
    v = F.trim(value)
    v = F.replace(v, F.lit("\\\\"), F.lit(_SENTINEL))
    v = F.replace(v, F.lit("\\'"), F.lit("''"))
    v = F.replace(v, F.lit(_SENTINEL), F.lit("\\\\"))
    v = F.replace(v, F.lit("0000-00-00 00:00:00"), F.lit("2000-01-01 00:00:00"))
    return F.replace(v, F.lit("0000-00-00"), F.lit("2000-01-01"))


def rewrite_insert_lines(
    lines: DataFrame, schema_changes: dict[str, Any] | None = None, line_col: str = "value"
) -> DataFrame:
    """(table, insert_sql) for every INSERT line of a mysqldump text
    frame, rewritten to psql syntax with schema changes applied
    (F13, PsqlParser.py:217-257). Non-INSERT lines and `_SKIP_`-ed
    tables are dropped; column lists are re-normalized to the
    reference's `("a", "b")` spacing.
    """
    changes = (schema_changes or {}).get("tables", schema_changes or {})

    line = _normalize_line(F.col(line_col))
    df = lines.select(line.alias("line")).filter(F.col("line").rlike(_INSERT_RE))
    df = df.select(
        F.regexp_extract("line", _INSERT_RE, 1).alias("t"),
        F.regexp_extract("line", _INSERT_RE, 2).alias("cols_part"),
        F.regexp_extract("line", _INSERT_RE, 3).alias("vals"),
    )

    skipped = [t for t, tr in changes.items() if tr == "_SKIP_"]
    if skipped:
        df = df.filter(~F.col("t").isin(skipped))

    # rename dispatch: WHEN chains keyed on the ORIGINAL table name.
    # Column renames map each EXTRACTED token through the rename dict
    # exactly once (transform + per-element WHEN chain), mirroring the
    # reference's single-pass per-column mapping (PsqlParser.py:241-246)
    # — sequential literal replaces over the raw column string would
    # cascade (a->b then b->c turns a into c) and double-rename an old
    # name that equals another column's new name.
    col_list = F.regexp_extract_all(F.col("cols_part"), F.lit('"([^"]*)"'), 1)
    new_table: Column = F.col("t")
    new_cols_list: Column = col_list
    for tname, trule in changes.items():
        if not isinstance(trule, dict):
            continue
        renames = [
            (old, crule["name"])
            for old, crule in trule.get("columns", {}).items()
            if isinstance(crule, dict) and "name" in crule
        ]
        if renames:

            def _token_mapper(renames: list[tuple[str, str]]):
                # single-arg lambda (transform treats a 2nd param as the
                # element index), renames bound via the factory
                def _map(c: Column) -> Column:
                    expr = F.when(c == renames[0][0], F.lit(renames[0][1]))
                    for old, new in renames[1:]:
                        expr = expr.when(c == old, F.lit(new))
                    return expr.otherwise(c)

                return _map

            new_cols_list = F.when(
                F.col("t") == tname, F.transform(col_list, _token_mapper(renames))
            ).otherwise(new_cols_list)
        if "name" in trule:
            new_table = F.when(F.col("t") == tname, F.lit(trule["name"])).otherwise(new_table)

    # re-normalized column list: '("' + '", "'.join(cols) + '")', then
    # the reference's exact 'INSERT INTO "%s" %s VALUES %s;' rebuild
    # (group 3 keeps its leading whitespace, like the reference's %s)
    column_str = F.concat(F.lit('("'), F.array_join(new_cols_list, '", "'), F.lit('")'))
    insert_sql = F.concat(
        F.lit('INSERT INTO "'),
        new_table,
        F.lit('" '),
        column_str,
        F.lit(" VALUES "),
        F.col("vals"),
        F.lit(";"),
    )
    return df.select(new_table.alias("table"), insert_sql.alias("insert_sql"))


def sql_copy_format(row_data: Column) -> Column:
    """F16 (sql_copy_format, PsqlParser.py:528-532): strip `::type`
    casts and `', E'` escape-string markers from a legacy copy-format
    line."""
    c = F.regexp_replace(row_data, r"::(\w*)", "")
    return F.replace(c, F.lit("', E'"), F.lit("', '"))


def skip_column_ddl(schema_changes: dict[str, Any] | None) -> list[str]:
    """ALTER TABLE ... DROP COLUMN IF EXISTS for every `_SKIP_`-ed
    column (generate_dump_from_mysql_dump epilogue, PsqlParser.py:95-96;
    RuleHandler.get_skip_colums:106-114) — the dump path loads full-width
    INSERTs and drops columns afterwards."""
    out = []
    tables = (schema_changes or {}).get("tables", {})
    for tname, trule in tables.items():
        if not isinstance(trule, dict):
            continue
        for cname, crule in trule.get("columns", {}).items():
            if crule == "_SKIP_":
                out.append(
                    f'ALTER TABLE "{trule.get("name", tname)}" '
                    f'DROP COLUMN IF EXISTS "{cname}";'
                )
    return out


def convert_dump_file(
    spark: SparkSession,
    mysql_dump_path: str,
    psql_dump_path: str,
    schema_changes: dict[str, Any] | None = None,
) -> int:
    """The whole deprecated mode end-to-end (PsqlParser.py:73-98):
    initial session statements, every INSERT line rewritten, constraint
    re-arm, skip-column drops. The conversion runs distributed (text
    scan -> rewritten part files); the single-file artifact is assembled
    by concatenating parts in order — a driver-side file copy, never a
    row collect. Returns the number of INSERT lines written."""
    from mysql2psql_spark.sinks.ddl import load_epilogue, load_preamble

    tmp_dir = psql_dump_path + ".parts"
    converted = rewrite_insert_lines(spark.read.text(mysql_dump_path), schema_changes)
    converted.select("insert_sql").write.mode("overwrite").text(tmp_dir)

    n = 0
    with open(psql_dump_path, "w") as out:
        out.write("\n".join(load_preamble()) + "\n\n")
        for part in sorted(os.listdir(tmp_dir)):
            if not part.startswith("part-"):
                continue
            with open(os.path.join(tmp_dir, part)) as f:
                for ln in f:
                    out.write(ln)
                    n += 1
        out.write("\n" + "\n".join(load_epilogue()) + "\n")
        for stmt in skip_column_ddl(schema_changes):
            out.write(stmt + "\n")
    return n
