"""Migration planner: rules -> per-table logical plans -> DataFrames."""

from mysql2psql_spark.plans.migration import MigrationPlan, compile_pre_sql, plan_migration

__all__ = ["MigrationPlan", "compile_pre_sql", "plan_migration"]
