"""Sources: Parquet test catalog + (gated) JDBC introspection.

The reference reads MySQL's information_schema catalog and full tables over
a PyMySQL socket (/root/reference/libs/MysqlParser.py:104-137); our engine
reads Parquet for the test harness and JDBC for real databases behind one
``load_table`` surface.
"""

from mysql2psql_spark.sources.parquet import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
