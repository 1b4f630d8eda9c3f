"""mysql2psql_spark — a PySpark-native analytics/ETL engine.

Re-expresses the full query and data-processing capability surface of the
reference migrator ``ggarri/mysql2psql`` (see SURVEY.md) as an idiomatic
Spark DataFrame/SQL engine, and extends it with the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) that a 100 TB deployment needs.

Design stance (SURVEY.md §7):
- DataFrame/Column expressions everywhere; Catalyst does pushdown/pruning.
- Declarative JSON rules compile to per-table plans of Column expressions.
- No source mutation; ``_PRE_SQL_`` idioms become transformations.
- Every operator is written for a 1000-executor cluster: broadcast small
  dims, map-side partial aggregation, no driver-side collects in the
  engine path.
"""

__version__ = "0.1.0"
