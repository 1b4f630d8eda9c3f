"""PostgreSQL DDL generation from the schema IR (SURVEY.md §2.10, D1-D10).

Pure string generators over the converted (psql) IR — the Spark engine
treats DDL as sink-side metadata. Semantics pinned to the reference:

- D1 CREATE TABLE with columns ordered PK -> FK -> rest
  (PsqlParser.py:422-434), skipped columns excluded
- D2 column clause: SERIAL iff extra=auto_increment, upper-cased type,
  size suffix except {text,bytea,smallint,decimal,set}, NOT NULL,
  inline PRIMARY KEY, typed DEFAULT (PsqlParser.py:476-511)
- D3 composite PK: >=2 PK columns demote inline PKs and emit a
  table-level PRIMARY KEY (a,b) clause (PsqlParser.py:436-474)
- D4 DROP TABLE IF EXISTS ... CASCADE (PsqlParser.py:277-285)
- D5 sequence setval for auto-increment tables (PsqlParser.py:348-355)
- D6 FK constraints ON DELETE RESTRICT DEFERRABLE INITIALLY IMMEDIATE
  (PsqlParser.py:385-403)
- D7 secondary indexes with renamed columns resolved (PsqlParser.py:405-420)
- D8 v1 compatibility views: old schema queryable over new, dropped
  columns NULL-backfilled (PsqlParser.py:162-197)
- D10/S10 schema preamble (PsqlParser.py:51-70)
"""

from __future__ import annotations

import re

from mysql2psql_spark.schema_ir import TableIR

NO_SIZE_SUFFIX = {"text", "bytea", "smallint", "decimal", "set"}
SKIP = "_SKIP_"


def _q(name: str) -> str:
    return f'"{name}"'


def _active_columns(table: TableIR) -> dict[str, dict]:
    return {k: c for k, c in table["columns"].items() if not c.get(SKIP)}


def _categorized(table: TableIR) -> list[dict]:
    """PK first, FK columns second, the rest in IR order (D1)."""
    cols = list(_active_columns(table).values())
    pks = [c for c in cols if c.get("isPk")]
    fks = [c for c in cols if not c.get("isPk") and c.get("reference")]
    rest = [c for c in cols if not c.get("isPk") and not c.get("reference")]
    return pks + fks + rest


def _default_clause(col: dict) -> str:
    """F14 default classing (PsqlParser.py:495-506): a NUMERIC default on
    a boolean column converts to true/false (MySQL stores tinyint(1)
    defaults as '0'/'1'; PostgreSQL rejects an integer default on
    BOOLEAN — caught by the r6 live-PostgreSQL-15 validation), true/false
    literals uppercase, other numerics and current_timestamp pass
    through, anything else is quoted."""
    d = str(col["default"])
    if d.lstrip("-").replace(".", "", 1).isdigit():
        if col["type"].lower() == "boolean":
            return " DEFAULT " + ("true" if d != "0" else "false")
        return f" DEFAULT {d}"
    if d.lower() in ("true", "false"):
        return f" DEFAULT {d.upper()}"
    if d.lower() == "current_timestamp":
        return f" DEFAULT {d}"
    return f" DEFAULT '{d}'"


def _enum_check_clause(col: dict) -> str | None:
    """VARCHAR + CHECK rendering for MySQL enum/set columns. The
    reference's own rule file maps enum -> 'set'
    (rules/mysql_to_psql.json:26) and its DDL writer emits the type
    verbatim (PsqlParser.py:487-489, size suppressed) — but SET is not a
    PostgreSQL type, so that DDL can never load (verified against live
    PostgreSQL 15 in r6). We keep the rule-file parity in the IR (the
    type stays 'set') and repair it at RENDER time, distinguishing the
    ORIGINAL MySQL type via fullType:

    - ``enum('a','b')`` stores exactly one label per row -> VARCHAR
      constrained with ``IN (labels)``;
    - ``set('a','b')`` stores a COMMA-JOINED combination ('a,b'), so an
      IN-check would reject valid multi-valued rows mid-\\copy (a
      data-dependent load abort, worse than a DDL failure) -> VARCHAR
      constrained per element: ``string_to_array(col, ',') <@
      ARRAY[labels]`` — subquery-free (legal in a CHECK), NULL passes
      (SQL CHECK semantics), and '' yields the empty array, which is
      contained in any set, matching MySQL's empty-SET value."""
    full = str(col.get("fullType") or "")
    m = re.match(r"^(enum|set)\((.*)\)$", full, re.IGNORECASE)
    if not m:
        return None
    kind, labels = m.group(1).lower(), m.group(2)
    if kind == "enum":
        return f"VARCHAR CHECK ({_q(col['name'])} IN ({labels}))"
    return (
        f"VARCHAR CHECK (string_to_array({_q(col['name'])}, ',') <@ ARRAY[{labels}])"
    )


def _column_clause(col: dict, composite_pk: bool) -> str:
    if col.get("extra") == "auto_increment":
        type_sql = "SERIAL"
    elif col["type"].lower() == "set":
        type_sql = _enum_check_clause(col) or "VARCHAR"
    else:
        type_sql = col["type"].upper()
        if col.get("size") and col["type"].lower() not in NO_SIZE_SUFFIX:
            type_sql += f"({col['size']})"
    parts = [f"{_q(col['name'])} {type_sql}"]
    if not col["nullable"]:
        parts.append("NOT NULL")
    if col.get("isPk") and not composite_pk:
        parts.append("PRIMARY KEY")
    if col.get("default") is not None:
        parts[-1] = parts[-1] + _default_clause(col)
    return " ".join(parts)


def create_table_ddl(table: TableIR) -> str:
    cols = _categorized(table)
    pk_cols = [c for c in cols if c.get("isPk")]
    composite = len(pk_cols) >= 2
    clauses = [_column_clause(c, composite) for c in cols]
    if composite:
        clauses.append("PRIMARY KEY (" + ", ".join(_q(c["name"]) for c in pk_cols) + ")")
    body = ",\n  ".join(clauses)
    return f"CREATE TABLE {_q(table['name'])} (\n  {body}\n);"


def drop_table_ddl(table: TableIR) -> str:
    return f"DROP TABLE IF EXISTS {_q(table['name'])} CASCADE;"


def sequence_ddl(table: TableIR) -> list[str]:
    if not table.get("autoIncrement"):
        return []
    return [
        f"SELECT setval('{table['name']}_{c['name']}_seq', {table['autoIncrement']}, false);"
        for c in _active_columns(table).values()
        if c.get("isPk") and c.get("extra") == "auto_increment"
    ]


def fk_constraint_ddl(table: TableIR, on_delete: str = "RESTRICT") -> list[str]:
    out = []
    for c in _active_columns(table).values():
        ref = c.get("reference")
        if not ref:
            continue
        out.append(
            f"ALTER TABLE {_q(table['name'])} ADD CONSTRAINT "
            f"{_q(table['name'] + '_' + c['name'] + '_fkey')} "
            f"FOREIGN KEY ({_q(c['name'])}) REFERENCES {ref} "
            f"ON DELETE {on_delete} DEFERRABLE INITIALLY IMMEDIATE;"
        )
    return out


def create_index_ddl(table: TableIR) -> list[str]:
    cols = table["columns"]
    out = []
    for idx in table.get("indexes", {}).values():
        # resolve renamed columns: index IR keys are original names
        resolved = [cols[c]["name"] if c in cols else c for c in idx["columns"]]
        out.append(
            f"CREATE INDEX {_q(table['name'] + '_' + idx['name'] + '_x')} "
            f"ON {_q(table['name'])} (" + ", ".join(_q(c) for c in resolved) + ");"
        )
    return out


def view_ddl(original_name: str, table: TableIR, v1_schema: str = "v1") -> str:
    """D8: a view named after the ORIGINAL table exposing the ORIGINAL
    column names over the migrated table; dropped columns come back as
    NULL so old queries keep parsing."""
    old_names, new_exprs = [], []
    for key, col in table["columns"].items():
        old_names.append(_q(key))
        if col.get(SKIP):
            new_exprs.append("NULL")
        else:
            new_exprs.append(_q(col["name"]))
    return (
        f"CREATE VIEW {_q(v1_schema)}.{_q(original_name)} ("
        + ", ".join(old_names)
        + ") AS SELECT "
        + ", ".join(new_exprs)
        + f" FROM public.{_q(table['name'])} WITH CASCADED CHECK OPTION;"
    )


def schema_preamble(v1_schema: str | None = None) -> list[str]:
    # SET search_path: the reference pins the session schema at the top
    # of its DDL script (SET SCHEMA 'public', PsqlParser.py:61,151) so
    # the artifacts are robust against a database-level search_path
    # override — exactly the failure the r6 live-PG validation hit: the
    # D9 bootstrap ALTERs the DATABASE's search_path to (v1, public),
    # after which an unpinned re-run of this script would create every
    # table inside v1.
    out = [
        "SET search_path TO public;",
        "DROP SCHEMA IF EXISTS public CASCADE;",
        "CREATE SCHEMA public;",
        'CREATE EXTENSION IF NOT EXISTS "unaccent";',
    ]
    if v1_schema:
        out.insert(2, f"DROP SCHEMA IF EXISTS {_q(v1_schema)} CASCADE;")
        out.append(f"CREATE SCHEMA {_q(v1_schema)};")
    return out


def load_preamble() -> list[str]:
    """D10 (PsqlParser.py:357-365): session options before the bulk data
    load — standard-conforming string literals ON (the reference's
    `SET standard_conforming_strings=on`, so backslashes are literal in
    the emitted data) + FK checks deferred so load order inside the
    transaction doesn't matter. search_path pinned like the DDL script
    (the reference's data writer emits SET SCHEMA 'public',
    PsqlParser.py:150-151) so \\copy targets resolve to public even
    after the D9 bootstrap rewrites the database search_path."""
    return [
        "SET search_path TO public;",
        "SET standard_conforming_strings = 'on';",
        "SET escape_string_warning = 'on';",
        "SET client_min_messages TO ERROR;",
        "SET client_encoding = 'UTF8';",
        "SET CONSTRAINTS ALL DEFERRED;",
    ]


def load_epilogue() -> list[str]:
    """D10 (PsqlParser.py:367-372): re-arm constraint checking after the
    load (any violation surfaces here, transactionally)."""
    return ["SET CONSTRAINTS ALL IMMEDIATE;"]


def escape_password(password: str) -> str:
    """F15 (PsqlParser.py:294): '$' -> '\\0024' so the password embeds in
    a PostgreSQL U&'...' unicode-escape literal ('$' is the common
    generated-password character that breaks dollar-quoted contexts)."""
    return password.replace("$", "\\0024")


def user_bootstrap_sql(
    user: str | None,
    password: str | None,
    db_name: str,
    group_role: str = "b7group_user",
    v1_schema: str = "v1",
) -> str:
    """D9 (PsqlParser.py:288-345): the re-pointing bootstrap a migration
    user runs so existing clients can connect to the new database —
    idempotent CREATE/ALTER USER, database ownership, the GRANT battery
    over both the v1 compatibility schema and public, search_path for
    database and user, and default privileges for future objects.

    Statement set mirrors the reference 1:1 (including its duplicated
    USAGE/SEQUENCES/TABLES block per schema); credentials come from the
    S6 point-lookup path (MysqlParser.get_user_user_pass:262-274).
    Returns "" for missing/empty/root users (PsqlParser.py:292-293).
    """
    if user is None or password is None:
        return ""
    if len(user) == 0 or user == "root":
        return ""
    pw = escape_password(password)
    grants = "\n".join(
        f"""GRANT USAGE ON SCHEMA {schema} TO {user};
GRANT ALL ON ALL SEQUENCES IN SCHEMA {schema} TO {user};
GRANT ALL PRIVILEGES ON ALL TABLES IN SCHEMA {schema} TO {user};"""
        for schema in (v1_schema, "public")
    )
    search_path = ", ".join((v1_schema, "public"))
    return f"""-- Adding PG User
DO $$DECLARE r record;
BEGIN
   IF NOT EXISTS (
      SELECT *
      FROM   pg_catalog.pg_user
      WHERE  usename = '{user}') THEN

      CREATE USER {user} WITH PASSWORD U&'{pw}';
   ELSE
      ALTER USER {user} WITH PASSWORD U&'{pw}';
   END IF;
END$$;
ALTER DATABASE {db_name} OWNER TO {user};
GRANT CONNECT ON DATABASE {db_name} TO {user};

GRANT {group_role} TO {user};

{grants}

ALTER DATABASE {db_name} SET search_path TO {search_path};
ALTER USER {user} SET search_path TO {search_path};
ALTER DEFAULT PRIVILEGES IN SCHEMA public GRANT ALL ON TABLES TO {user};
ALTER DEFAULT PRIVILEGES IN SCHEMA public GRANT ALL ON SEQUENCES TO {user};
ALTER DEFAULT PRIVILEGES IN SCHEMA {v1_schema} GRANT ALL ON TABLES TO {user};
ALTER DEFAULT PRIVILEGES IN SCHEMA {v1_schema} GRANT ALL ON SEQUENCES TO {user};
"""
