"""JSONL (newline-delimited JSON) source + sink — the de-facto
interchange format of LLM training-data pipelines (one document object
per line). The reference moves data as CSV only (libs/PsqlParser.py
\\copy dialect); a corpus engine additionally needs JSONL because text
documents routinely contain the CSV dialect's own delimiters, quotes,
and raw newlines — JSON escapes all of them losslessly (`\\n` inside the
string), keeping the file line-delimited and therefore SPLITTABLE: a
1000-executor cluster can scan one multi-TB uncompressed/zstd-framed
JSONL file in parallel because every record boundary is a newline.
(Gzip'd JSONL is NOT splittable — one task per .gz file; compress with
per-file sizing or a splittable codec at scale.)

Schema-first like the CSV half: inference would force a second pass over
100 TB of text, so readers pass the schema and choose FAILFAST (abort on
malformed line) or PERMISSIVE (quarantine to `_corrupt_record`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write ``df`` as JSONL. ``num_files`` coalesces the output (small
    dimension tables → a handful of files); omit it for corpus-sized
    frames so each task writes its own partition."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, strict: bool = True
) -> DataFrame:
    """Read a JSONL directory (or single file) with the given schema.
    ``strict=True`` uses FAILFAST so one malformed line aborts the read;
    ``strict=False`` uses PERMISSIVE and routes broken lines into the
    ``_corrupt_record`` column so a multi-hour ingest survives dirty
    upstream shards."""
    reader = spark.read.schema(
        schema
        if strict
        else T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    ).option("mode", "FAILFAST" if strict else "PERMISSIVE")
    return reader.json(path)
