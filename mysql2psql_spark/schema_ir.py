"""Schema IR: the JSON schema tree the reference checkpoints between
pipeline stages, plus conversion to Spark StructType with field metadata.

Shape parity with the reference IR (built at
/root/reference/libs/MysqlParser.py:48-52 root, 165-172 table node,
211-221 column node, 254-257 index node; serialized at main.py:54-69):

    {"tables": {<table>: {
        "name": ..., "collation": ..., "engine": ..., "autoIncrement": ...,
        "columns": {<col>: {"name","type","nullable","size","default",
                            "extra","isPk","fullType","reference"}},
        "indexes": {<idx>: {"name", "columns": [..]}}}}}

Python 3.7+ dicts preserve insertion order, matching the reference's
OrderedDict discipline (libs/MysqlParser.py:146,183,232).
"""

from __future__ import annotations

import copy
import json
from typing import Any

from pyspark.sql import types as T

TableIR = dict[str, Any]
SchemaIR = dict[str, Any]


def new_column(
    name: str,
    type_: str,
    nullable: bool = True,
    size: str | None = None,
    default: str | None = None,
    extra: str | None = None,
    is_pk: bool = False,
    full_type: str | None = None,
    reference: str | None = None,
) -> dict[str, Any]:
    return {
        "name": name,
        "type": type_,
        "nullable": nullable,
        "size": size,
        "default": default,
        "extra": extra,
        "isPk": is_pk,
        "fullType": full_type or type_,
        "reference": reference,
    }


def new_table(
    name: str,
    columns: list[dict[str, Any]],
    indexes: dict[str, list[str]] | None = None,
    collation: str | None = None,
    engine: str = "INNODB",
    auto_increment: int | None = None,
) -> TableIR:
    return {
        "name": name,
        "collation": collation,
        "engine": engine,
        "autoIncrement": auto_increment,
        "columns": {c["name"]: c for c in columns},
        "indexes": {i: {"name": i, "columns": cols} for i, cols in (indexes or {}).items()},
    }


def new_schema(tables: list[TableIR]) -> SchemaIR:
    return {"tables": {t["name"]: t for t in tables}}


def to_json(ir: SchemaIR) -> str:
    """Checkpoint dump — same role as mysql_schema[_v2]/psql_schema.json
    (main.py:54-69)."""
    return json.dumps(ir, indent=2)


def from_json(s: str) -> SchemaIR:
    return json.loads(s)


def clone(ir: SchemaIR) -> SchemaIR:
    return copy.deepcopy(ir)


# --- type mapping to Spark ---------------------------------------------------
# SURVEY.md §1.2 table: MySQL/PG scalar type strings -> Spark types.
_SPARK_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "tinyint": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "mediumint": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "text": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "enum": T.StringType(),
    "set": T.StringType(),
    "blob": T.BinaryType(),
    "longblob": T.BinaryType(),
    "bytea": T.BinaryType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    # MySQL TIME has no Spark type; carried as HH:MM string (SURVEY F11)
    "time": T.StringType(),
}


def spark_type_for(col: dict[str, Any]) -> T.DataType:
    t = col["type"].lower()
    if t in ("decimal", "double", "numeric"):
        if col.get("size"):
            p, s = (int(x) for x in str(col["size"]).split(","))
            return T.DecimalType(p, s)
        return T.DecimalType(18, 6) if t != "double" else T.DoubleType()
    return _SPARK_TYPES.get(t, T.StringType())


def to_struct_type(table: TableIR) -> T.StructType:
    """StructType with per-field metadata carrying what Spark's type
    system can't (isPk, reference, extra, default, fullType) — the IR
    round-trips via StructType.jsonValue()/fromJson()."""
    fields = []
    for col in table["columns"].values():
        meta = {
            k: col[k]
            for k in ("isPk", "reference", "extra", "default", "fullType", "size")
            if col.get(k) is not None
        }
        fields.append(
            T.StructField(col["name"], spark_type_for(col), bool(col["nullable"]), metadata=meta)
        )
    return T.StructType(fields)


# --- introspection from a live DataFrame (stage [1] for parquet sources) -----
_FROM_SPARK: dict[str, str] = {
    "boolean": "boolean",
    "short": "smallint",
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "varchar",
    "binary": "blob",
    "date": "date",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
}


def from_dataframe(name: str, df, pk: str | None = None) -> TableIR:
    """Stage [1] INTROSPECT for file sources: build the table IR from a
    DataFrame's schema (the parquet footer is the catalog — the analogue
    of the reference's information_schema reads, libs/MysqlParser.py:
    147-154). Array/struct columns are carried opaquely as 'varchar'
    unless the engine consumes them natively."""
    cols = []
    for f in df.schema.fields:
        tname = _FROM_SPARK.get(f.dataType.typeName(), "varchar")
        full = tname
        if f.dataType.typeName() == "decimal":
            tname, full = "decimal", f.dataType.simpleString()
        cols.append(
            new_column(
                f.name,
                tname,
                nullable=f.nullable,
                full_type=full,
                is_pk=(f.name == pk),
            )
        )
    return new_table(name, cols)
