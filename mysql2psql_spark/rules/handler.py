"""Rule compiler: the reference's three JSON rule families, same input
formats, compiled against the schema IR instead of mutating dicts row-by-
row. Reference semantics (RuleHandler at /root/reference/libs/
RuleHandler.py; rule files at /root/reference/rules/*.json):

1. schema-change rules (schema_changes.json shape:
   {"tables": {<table>: "_SKIP_" | {"name": ..., "_PRE_SQL_": [...],
   "columns": {<col>: "_SKIP_" | {attr: value, ...}}}}}):
   - table value "_SKIP_" deletes the table (RuleHandler.py:41-43)
   - "name" renames table / column (RuleHandler.py:61-65)
   - column value "_SKIP_" drops the column (RuleHandler.py:66-69) —
     recorded under a dedicated "_SKIP_": True key (the reference's own
     checkpoint shape, RuleHandler.py:66) so downstream view generation
     can NULL-backfill it (PsqlParser.py:184)
   - a "type" override nulls the stale "size" ONLY when the same rule
     does not set "size" itself (RuleHandler.py:71-73: `'size' not in
     col_attrs`)
   - "_PRE_SQL_" raw statements are collected, never executed against the
     source (engine deviation, SURVEY §7: re-expressed as transformations)

2. node rules (mysql_to_psql.json shape: {"column": {<attr>: [{"from",
   "to", "_IF_": [{"attr","val","to"}]}]}, "table": {...}}): value rewrite
   on any column/table attribute, with _IF_ refinement on another
   attribute (RuleHandler.py:75-103); e.g. tinyint->smallint unless
   fullType=tinyint(1) -> boolean.

3. dump rules (mysql_raw_dump.json shape: {"column": {<attr>: [{"value",
   "method"}]}}): per-column dispatch — if col[attr] == value (or
   "notNone": attr present) attach the named conversion function
   (PsqlParser.py:200-214). Resolves into mysql2psql_spark.rules.
   dump_functions Column-expression builders.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from mysql2psql_spark.rules.dump_functions import DUMP_FUNCTIONS
from mysql2psql_spark.schema_ir import SchemaIR, TableIR, clone

SKIP = "_SKIP_"
PRE_SQL = "_PRE_SQL_"


# --- 1. schema-change rules --------------------------------------------------


def apply_schema_changes(ir: SchemaIR, changes: dict[str, Any]) -> tuple[SchemaIR, dict[str, list[str]]]:
    """Pipeline stage [2] (main.py:59-64): returns (rewritten IR,
    {table: [pre-SQL statements]}). The IR keeps ORIGINAL column keys with
    rewritten "name" attrs (rename resolution happens at plan build), and
    skipped columns stay present flagged _SKIP_=True so the view
    generator can backfill them.
    """
    out = clone(ir)
    pre_sql: dict[str, list[str]] = {}
    table_rules = changes.get("tables", changes)
    for tname, trule in table_rules.items():
        if tname not in out["tables"]:
            continue
        table = out["tables"][tname]
        if trule == SKIP:
            del out["tables"][tname]
            continue
        if PRE_SQL in trule:
            pre_sql[tname] = list(trule[PRE_SQL])
        if "name" in trule:
            table["name"] = trule["name"]
        for cname, crule in trule.get("columns", {}).items():
            if cname not in table["columns"]:
                continue
            col = table["columns"][cname]
            if crule == SKIP:
                col[SKIP] = True
                continue
            for attr, val in crule.items():
                col[attr] = val
            # stale size: only when the rule overrides "type" WITHOUT
            # also setting "size" (RuleHandler.py:71-73)
            if "type" in crule and "size" not in crule:
                col["size"] = None
    return out, pre_sql


# --- 2. node rules (type conversion) -----------------------------------------


def _apply_node_rule(node: dict[str, Any], attr: str, rule: dict[str, Any]) -> None:
    if node.get(attr) != rule["from"]:
        return
    to = rule["to"]
    for cond in rule.get("_IF_", []):
        if node.get(cond["attr"]) == cond["val"]:
            to = cond["to"]
            break
    node[attr] = to


def apply_node_rules(ir: SchemaIR, node_rules: dict[str, Any]) -> SchemaIR:
    """Pipeline stage [3] (main.py:66 -> PsqlParser.get_schema_from_mysql):
    type/attr conversion over every table and column node."""
    out = clone(ir)
    for table in out["tables"].values():
        for attr, rules in node_rules.get("table", {}).items():
            for rule in rules:
                _apply_node_rule(table, attr, rule)
        for col in table["columns"].values():
            for attr, rules in node_rules.get("column", {}).items():
                for rule in rules:
                    _apply_node_rule(col, attr, rule)
            # double -> decimal keeps its (p,s) via dsize
            # (libs/MysqlParser.py:215); handled by keeping col["size"]
    return out


# --- 3. dump rules (value conversion dispatch) --------------------------------


def compile_dump_plan(table: TableIR, dump_rules: dict[str, Any]) -> dict[str, list[str]]:
    """Per-column method-name dispatch over the CONVERTED (psql) schema,
    mirroring tranf_method compilation (PsqlParser.py:200-214). Returns
    {column_key: [method_name, ...]}: the reference accumulates EVERY
    matching (attr, rule) into tuple_to_check and applies them in
    sequence (_apply_raw_dump_rules), so e.g. a nullable FK datetime
    column gets both notNullableDatetime and refToNullable."""
    plan: dict[str, list[str]] = {}
    col_rules = dump_rules.get("column", {})
    for key, col in table["columns"].items():
        for attr, rules in col_rules.items():
            for rule in rules:
                matches = (
                    col.get(attr) is not None
                    if rule["value"] == "notNone"
                    else str(col.get(attr, "")).lower() == str(rule["value"]).lower()
                )
                if matches:
                    plan.setdefault(key, []).append(rule["method"])
    return plan


def dump_expression(col_key: str, col: dict[str, Any], methods: list[str] | None) -> Column:
    """Resolve one column's conversion chain into a Column expression,
    aliased to its (possibly renamed) output name. Methods compose in
    rule order, exactly as the reference applies them row-by-row
    (PsqlParser.py:210-214)."""
    expr = F.col(col_key)
    for method in methods or ():
        expr = DUMP_FUNCTIONS[method](expr, nullable=bool(col["nullable"]))
    return expr.alias(col["name"])
