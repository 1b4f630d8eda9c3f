"""Bundled default rule tables, semantics-equivalent to the reference's
rules/mysql_to_psql.json and rules/mysql_raw_dump.json (re-derived from
SURVEY.md §1.2/§2.11 — same shapes, accepted interchangeably with
user-supplied JSON files)."""

from __future__ import annotations

# MySQL -> PostgreSQL type conversion (rules/mysql_to_psql.json:3-36).
MYSQL_TO_PSQL: dict = {
    "column": {
        "type": [
            {"from": "datetime", "to": "timestamp"},
            {
                "from": "tinyint",
                "to": "smallint",
                "_IF_": [{"attr": "fullType", "val": "tinyint(1)", "to": "boolean"}],
            },
            {
                "from": "smallint",
                "to": "smallint",
                "_IF_": [{"attr": "fullType", "val": "smallint(1)", "to": "boolean"}],
            },
            {
                "from": "int",
                "to": "int",
                "_IF_": [{"attr": "fullType", "val": "int(1)", "to": "boolean"}],
            },
            {"from": "mediumint", "to": "int"},
            {"from": "mediumtext", "to": "text"},
            {"from": "longtext", "to": "text"},
            {"from": "longblob", "to": "bytea"},
            {"from": "blob", "to": "bytea"},
            {"from": "double", "to": "decimal"},
            {"from": "enum", "to": "set"},
        ],
        "default": [{"from": "CURRENT_TIMESTAMP", "to": "current_timestamp"}],
    },
    "table": {"engine": [{"from": "MyISAM", "to": "INNODB"}]},
}

# Per-column data-conversion dispatch (rules/mysql_raw_dump.json) — matched
# against the CONVERTED (psql) schema.
MYSQL_RAW_DUMP: dict = {
    "column": {
        "type": [
            {"value": "boolean", "method": "convertStrBoolean"},
            {"value": "bytea", "method": "makeItEmpty"},
            {"value": "TIME", "method": "makeItTime"},
        ],
        "fullType": [
            {"value": "datetime", "method": "notNullableDatetime"},
            {"value": "date", "method": "notNullableDate"},
        ],
        "reference": [{"value": "notNone", "method": "refToNullable"}],
    }
}
