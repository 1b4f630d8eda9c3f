"""The migration pipeline under the driver's correctness gate.

Runs the full rule-driven migration (FIXTURES.md §B reservation fixture:
rename + FK attach + nullable override + column skip + pre-SQL orphan
cleanup + value conversions) inside Spark, with the equivalent relational
semantics spelled out in ANSI SQL for the DuckDB oracle. This is the
reference's whole §3.1 lifecycle, hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql2psql_spark import schema_ir as ir
from mysql2psql_spark.plans.migration import migrate_table, plan_migration
from mysql2psql_spark.queries import query

_SCHEMA_CHANGES = {
    "tables": {
        "reservation_reminder": {
            "_PRE_SQL_": [
                "DELETE IGNORE FROM reservation_reminder WHERE resa_id NOT IN (SELECT id FROM reservation)"
            ],
            "name": "reminder",
            "columns": {
                "resa_id": {"name": "reservation_id", "reference": "reservation (id)"},
                "user_id": {"nullable": True},
                "legacy_col": "_SKIP_",
            },
        },
    }
}

# Deterministic fixture rows (shared shape with the VALUES list in the
# oracle SQL below). Ten reminders over four reservations; includes FK=0
# ("no parent"), a zero-datetime, and two orphans.
_RESERVATIONS = [(10,), (20,), (30,), (0,)]
_REMINDERS = [
    (1, 10, 5, "a", "2020-01-01 10:00:00"),
    (2, 0, 6, "b", "0000-00-00 00:00:00"),
    (3, 999, 7, "c", "2020-03-01 09:00:00"),  # orphan
    (4, 20, 8, "d", None),
    (5, 30, 9, "e", "2021-07-15 23:59:59"),
    (6, 30, 10, "f", "0000-00-00 00:00:00"),
    (7, 888, 11, "g", "2022-01-01 00:00:00"),  # orphan
    (8, 10, 12, "h", "2023-02-28 08:30:00"),
    (9, 0, 13, "i", None),
    (10, 20, 14, "j", "2024-06-01 12:00:00"),
]


def _fixture_ir() -> dict:
    reminder = ir.new_table(
        "reservation_reminder",
        [
            ir.new_column("id", "int", nullable=False, is_pk=True),
            ir.new_column("resa_id", "int", nullable=True),
            ir.new_column("user_id", "int", nullable=False),
            ir.new_column("legacy_col", "varchar", size="50"),
            ir.new_column("remind_at", "datetime", full_type="datetime"),
        ],
    )
    reservation = ir.new_table(
        "reservation", [ir.new_column("id", "int", nullable=False, is_pk=True)]
    )
    return ir.new_schema([reservation, reminder])


@query(
    "m1_migration_pipeline",
    oracle="""
    WITH reservation(id) AS (VALUES (10), (20), (30), (0)),
    reminders(id, resa_id, user_id, legacy_col, remind_at) AS (VALUES
      (1, 10, 5, 'a', '2020-01-01 10:00:00'),
      (2, 0, 6, 'b', '0000-00-00 00:00:00'),
      (3, 999, 7, 'c', '2020-03-01 09:00:00'),
      (4, 20, 8, 'd', NULL),
      (5, 30, 9, 'e', '2021-07-15 23:59:59'),
      (6, 30, 10, 'f', '0000-00-00 00:00:00'),
      (7, 888, 11, 'g', '2022-01-01 00:00:00'),
      (8, 10, 12, 'h', '2023-02-28 08:30:00'),
      (9, 0, 13, 'i', NULL),
      (10, 20, 14, 'j', '2024-06-01 12:00:00'))
    SELECT r.id,
           NULLIF(r.resa_id, 0) AS reservation_id,
           r.user_id,
           CASE WHEN r.remind_at LIKE '0000%' THEN NULL ELSE r.remind_at END AS remind_at
    FROM reminders r
    WHERE EXISTS (SELECT 1 FROM reservation p WHERE p.id = r.resa_id)
    """,
)
def m1_migration_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = plan_migration(_fixture_ir(), schema_changes=_SCHEMA_CHANGES)
    reminders = spark.createDataFrame(
        _REMINDERS, "id int, resa_id int, user_id int, legacy_col string, remind_at string"
    )
    parents = {"reservation": spark.createDataFrame(_RESERVATIONS, "id int")}
    return migrate_table(reminders, plan, "reservation_reminder", parents)


# ---------------------------------------------------------------------------
# Incremental upsert (the migrator's continuous-load extension): merge a
# deterministic change batch into the customer snapshot, latest version
# per key winning — MERGE INTO semantics as one union + max_by hash
# aggregate. No window: max_by keeps the whole merge a single map-side-
# combinable shuffle on the key, and the change batch unions in without
# ever being collected. (The reference migrates one frozen snapshot;
# plans/incremental.py adds append-only loads; this is the update path.)
# ---------------------------------------------------------------------------
@query(
    "m2_incremental_upsert",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, ROUND(c_acctbal + 100.0, 2) AS c_acctbal, 1 AS version
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 10000000, 0.0, 1
      FROM customer WHERE c_custkey % 97 = 0
    ),
    all_rows AS (
      SELECT c_custkey, c_acctbal, 0 AS version FROM customer
      UNION ALL SELECT * FROM changes
    )
    SELECT c_custkey,
           ARG_MAX(c_acctbal, version) AS c_acctbal_cur,
           CAST(MAX(version) AS INT) AS version
    FROM all_rows GROUP BY c_custkey
    """,
)
def m2_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql2psql_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        # round the updated balance to its 2-decimal money grain on BOTH
        # sides: fl(fl(x)+100) can differ from the oracle's evaluation
        # order by 1 ulp, and the driver's hash compare is exact — the
        # round snaps both engines to the same double.
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit(1).alias("version"),
    )
    inserts = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit(1).alias("version"),
    )
    snapshot = c.withColumn("version", F.lit(0))
    merged = snapshot.unionByName(updates).unionByName(inserts)
    return merged.groupBy("c_custkey").agg(
        F.max_by("c_acctbal", "version").alias("c_acctbal_cur"),
        F.max("version").cast("int").alias("version"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 history build (the migrator's audit-trail extension): from
# the same deterministic snapshot + change batch as m2, emit one row per
# (key, version) with its superseding version and a current flag —
# MERGE-with-history semantics as a single per-key window pass. The
# window partitions by key, so the sort is per-key-history-sized (2 rows
# here), never global; at 100 TB the shuffle is one key-hash exchange of
# the union, the same cost as the m2 upsert.
# ---------------------------------------------------------------------------
@query(
    "m3_scd2_history",
    oracle="""
    WITH rows AS (
      SELECT c_custkey, c_acctbal, 0 AS version FROM customer
      UNION ALL
      SELECT c_custkey, ROUND(c_acctbal + 100.0, 2), 1
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, c_acctbal, CAST(version AS INT) AS version,
           CAST(LEAD(version) OVER w AS INT) AS superseded_by,
           (LEAD(version) OVER w IS NULL) AS is_current
    FROM rows WINDOW w AS (PARTITION BY c_custkey ORDER BY version)
    """,
)
def m3_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mysql2psql_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    snapshot = c.withColumn("version", F.lit(0))
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit(1).alias("version"),
    )
    rows = snapshot.unionByName(updates)
    w = Window.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return rows.select(
        "c_custkey",
        "c_acctbal",
        F.col("version").cast("int").alias("version"),
        nxt.cast("int").alias("superseded_by"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# CDC changelog apply (the migrator's ongoing-replication extension,
# the step after m2's one-shot upsert): treat the events stream as a
# keyed changelog — 'error' rows are tombstones, everything else upserts
# the user's latest value. Apply = keep the latest op per key (window
# row_number over the key partition — one key-hash shuffle, per-key sort
# only), then drop keys whose final op is a delete. At 100 TB the plan is
# a single exchange on user_id; no global sort, no driver state.
# ---------------------------------------------------------------------------
@query(
    "m4_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             event_type
      FROM events
    ),
    latest AS (
      SELECT user_id, ts, value, op, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM log
    )
    SELECT user_id,
           event_type AS last_event_type,
           CAST(ROUND(CAST(value AS DECIMAL(12,4)), 2) AS DOUBLE) AS cur_value,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS last_ts
    FROM latest
    WHERE rn = 1 AND op = 'U'
    """,
)
def m4_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mysql2psql_spark.operators.timeutil import epoch_of
    from mysql2psql_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    ep = epoch_of(e)
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = log.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & (F.col("op") == "U")
    )
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round(F.col("value").cast("decimal(12,4)"), 2).cast("double").alias("cur_value"),
        ep("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# FK-orphan profile — the validation report behind the reference's
# orphan-cleanup pre-SQL (_PRE_SQL_ DELETE ... NOT IN, RuleHandler) and
# our j4 repair-join: for each FK relation, how many child rows point at
# a missing parent. Each relation is a broadcast anti join against the
# (small) parent key set aggregated to one row — the corpus never
# shuffles, and the three relations union into one report.
# ---------------------------------------------------------------------------
@query(
    "profile_fk_orphans",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS relation,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child_rows,
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
             AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
           CAST((SELECT COUNT(*) FROM supplier
                 WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT)
    """,
)
def profile_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql2psql_spark.sources import load_table

    def relation(name, child, child_key, parent, parent_key):
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(parent_key).distinct()
        orphans = c.join(
            p, c[child_key] == p[parent_key], "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        total = c.agg(F.count("*").alias("n_child_rows"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relation"), "n_child_rows", "n_orphans"
        )

    return (
        relation("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey")
        .unionByName(
            relation("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
        )
        .unionByName(
            relation("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey")
        )
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (m5) — the materialized-view update
# step of an ongoing replication: a stored per-customer aggregate (orders
# before the watermark) is merged with the aggregate of ONLY the new
# partition (orders at/after the watermark) via a keyed outer merge that
# adds counts and decimal sums. At 100 TB the base side is the
# |customers|-row MV — the new data is the only thing scanned, and the
# merge is one key-hash shuffle of two pre-aggregated (small) sides. The
# oracle recomputes the aggregate from scratch over ALL orders, so the
# check pins the merge algebra itself: base ⊕ delta must equal the full
# recompute, including customers present on only one side.
# ---------------------------------------------------------------------------
@query(
    "m5_agg_maintenance",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS total_spend
    FROM orders
    GROUP BY o_custkey
    """,
)
def m5_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql2psql_spark.sources import load_table

    cut = F.to_timestamp(F.lit("1997-06-01 00:00:00"))
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("spend"),
        )

    base = agg(o.filter(F.col("o_orderdate") < cut))
    delta = agg(o.filter(F.col("o_orderdate") >= cut))
    zero_n = F.lit(0).cast("bigint")
    zero_s = F.lit(0).cast("decimal(12,4)")
    merged = base.alias("b").join(
        delta.alias("d"), F.col("b.o_custkey") == F.col("d.o_custkey"), "full_outer"
    )
    return merged.select(
        F.coalesce(F.col("b.o_custkey"), F.col("d.o_custkey")).alias("o_custkey"),
        (
            F.coalesce(F.col("b.n_orders"), zero_n)
            + F.coalesce(F.col("d.n_orders"), zero_n)
        ).alias("n_orders"),
        F.round(
            F.coalesce(F.col("b.spend"), zero_s) + F.coalesce(F.col("d.spend"), zero_s),
            2,
        )
        .cast("double")
        .alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# Row-checksum validation (m6) — the "did the copy corrupt anything"
# gate a migration runs source-vs-target: each row folds to an md5 over
# a CANONICAL rendering (timestamps as epoch seconds, money as integer
# cents, strings raw — float/timestamp STRING formatting differs across
# engines, integers never do), and the per-table aggregate is
# order-free: row count + the BIT_XOR fold of each digest's first 15
# hex digits (XOR is commutative/associative and can never overflow —
# a SUM of 2^60-scale digests overflows BIGINT within thousands of
# rows). Any flipped value anywhere in the table moves the fold; an
# even number of IDENTICAL corrupt rows would XOR-cancel, which the row
# count and the md5's row-uniqueness make vanishingly unlikely. One
# scan, map-side combine, a 1-row result per table regardless of scale;
# run on both ends of a copy and diff the 3 numbers.
# ---------------------------------------------------------------------------
@query(
    "m6_row_checksums",
    oracle="""
    WITH c AS (
      SELECT MD5(CONCAT_WS('|',
               CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR),
               CAST(CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS VARCHAR),
               o_orderpriority)) AS h
      FROM orders
    )
    SELECT 'orders' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(BIT_XOR(CAST(CONCAT('0x', SUBSTR(h, 1, 15)) AS BIGINT)) AS BIGINT)
             AS checksum
    FROM c
    """,
)
def m6_row_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql2psql_spark.operators.timeutil import epoch_of
    from mysql2psql_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders")
    ep = epoch_of(o, "o_orderdate")
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            ep("o_orderdate").cast("string"),
            F.col("o_orderpriority"),
        )
    )
    return (
        o.select(h.alias("h"))
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(cast(conv(substring(h, 1, 15), 16, 10) as bigint))")
            .alias("checksum"),
        )
        .select(F.lit("orders").alias("table_name"), "n_rows", "checksum")
    )


# ---------------------------------------------------------------------------
# QUEUED (r14/r15 registration per the window budget): snapshot diff /
# reconciliation (m7) — m4's inverse: given TWO snapshots of a table,
# derive the change set (added / removed / changed + the per-row list of
# changed columns). This is the migration-validation query run after a
# copy window closes ("what drifted between source and target since the
# cutover?") and the CDC-bootstrap when the source has no binlog: diff
# two snapshots, feed the result to m4_cdc_apply. Snapshot B is built
# from A by deterministic keyed rules (drop key%97=3; key%91=5 shifts
# o_totalprice by +1.5 — pure double addition, no rounding, so both
# engines derive bit-identical values; key%89=7 reassigns status +
# priority; key%101=11 spawns a new key+1e8 row) so the oracle restates
# the identical construction.
#
# Scale shape: ONE full-outer join on the snapshot key — with both
# snapshots bucketed by key (the o6/layout discipline) this is an
# exchange-free sort-merge diff; nothing else shuffles, and the output
# is O(changes), never O(rows). Column compares are null-safe
# (eqNullSafe / IS DISTINCT FROM) and the changed-column list is a
# fixed alphabetical CONCAT_WS both engines render identically.
#
# r13 verification record (the queue contract): DuckDB-exact under a
# vanilla session at sf0.001 (64 rows), sf0.01 (632), and sf0.1 (6315);
# change-class composition pinned against the keyed rules recomputed in
# pure Python (added/removed/changed key sets match exactly, no empty
# changed_columns, the changed-column lists are exactly the three
# rule-derivable values); 5x orders replica probe: wall x1.4 at x5 keys
# with x5 output; first 7-rep interleaved median 0.620 s at sf0.1
# (loadavg 5-10, controls at their floors in the same reps).
# ---------------------------------------------------------------------------
_DIFF_COLS = [
    "o_custkey",
    "o_orderdate",
    "o_orderpriority",
    "o_orderstatus",
    "o_totalprice",
]

_ORACLE_SNAPSHOT_DIFF = """
    WITH a AS (SELECT * FROM orders),
    b AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 89 = 7 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 91 = 5 THEN o_totalprice + 1.5
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate,
             CASE WHEN o_orderkey % 89 = 7 THEN '9-REASSIGNED'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM a WHERE o_orderkey % 97 != 3
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice,
             o_orderdate, o_orderpriority
      FROM a WHERE o_orderkey % 101 = 11
    ),
    d AS (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  ELSE 'changed' END AS change_type,
             CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN NULL
                  ELSE CONCAT_WS(',',
                    CASE WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                         THEN 'o_custkey' END,
                    CASE WHEN a.o_orderdate IS DISTINCT FROM b.o_orderdate
                         THEN 'o_orderdate' END,
                    CASE WHEN a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
                         THEN 'o_orderpriority' END,
                    CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                         THEN 'o_orderstatus' END,
                    CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                         THEN 'o_totalprice' END)
             END AS changed_columns
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey, change_type, changed_columns
    FROM d
    WHERE NOT (change_type = 'changed' AND changed_columns = '')
"""


@query("m7_snapshot_diff", oracle=_ORACLE_SNAPSHOT_DIFF)
def m7_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: the change set between snapshot A
    (orders as-is) and the deterministically mutated snapshot B — see
    the block above. Reference parity: the reference migrates one frozen
    snapshot (mysql2psql.py's table loop) and leaves drift detection to
    the operator; this is that missing re-sync step as one relational
    diff."""
    from pyspark.sql import functions as F

    from mysql2psql_spark.sources import load_table

    a = load_table(spark, sf_dir, "orders").select("o_orderkey", *_DIFF_COLS)
    surviving = a.filter(F.col("o_orderkey") % 97 != 3).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 89 == 7, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 91 == 5, F.col("o_totalprice") + 1.5)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.col("o_orderdate"),
        F.when(F.col("o_orderkey") % 89 == 7, F.lit("9-REASSIGNED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    inserted = a.filter(F.col("o_orderkey") % 101 == 11).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.col("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    b = surviving.unionByName(inserted)
    al, bl = a.alias("a"), b.alias("b")
    j = al.join(bl, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change_type = (
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .otherwise("changed")
    )
    diffs = [
        F.when(~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), F.lit(c))
        for c in _DIFF_COLS
    ]
    changed_columns = F.when(
        F.col("a.o_orderkey").isNotNull() & F.col("b.o_orderkey").isNotNull(),
        F.concat_ws(",", *diffs),
    )
    d = j.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        change_type.alias("change_type"),
        changed_columns.alias("changed_columns"),
    )
    return d.filter(
        ~((F.col("change_type") == "changed") & (F.col("changed_columns") == ""))
    )


# ---------------------------------------------------------------------------
# QUEUED (r15+ registration per the window budget): schema-evolution
# plan (m8) — the DDL-diff companion of m7's DATA diff, and the natural
# extension of the reference's migration tooling (libs/PsqlParser.py
# generates v1 DDL; a production migration ALSO needs the ALTER plan
# between schema versions). Schema v2 is derived from the live v1
# catalog by deterministic rules (the m7 mutation discipline, applied
# to METADATA): columns whose name length % 7 = 3 are dropped, names
# with length % 5 = 2 are renamed to 'r_<name>', every table gains a
# trailing '<table>_etl_ts' audit column, and v2 positions are
# REINDEXED (as a real v2 catalog would be). A GENERIC name-keyed
# differ (full outer join on table+column) then classifies
# added/dropped/moved and emits the ALTER fragment for each actionable
# row — renames surface as drop+add pairs BY DESIGN (a name-keyed
# differ cannot carry rename intent; the reference's rule files exist
# precisely to express it, which is the documented handoff).
#
# Scale shape: pure catalog metadata — tens of rows end to end; the
# only cost is two schema introspections. Determinism: every rule is a
# LENGTH/CONCAT expression stated identically in both engines; the
# catalog (name, pos) feed is the s2-pinned portable core, so no type
# vocabulary ever crosses engines.
#
# r14 verification record (the queue contract): DuckDB-exact under a
# vanilla session at sf0.001/sf0.01/sf0.1 (identical 44-row plan at
# all three: 19 added + 15 dropped + 10 moved — the catalog is
# SF-invariant, itself a useful pin); rule-direction invariants pinned
# in tests (every dropped name has length % 7 = 3 or % 5 = 2; every
# added name is 'r_'-prefixed or '_etl_ts'-suffixed; moved rows carry
# both positions and NULL ddl; every drop/add row carries a
# well-formed ALTER). First 7-rep interleaved median 1.839 s at sf0.1
# (loadavg 3-5, control s2_catalog_columns at 0.99 s ~ its bench
# scale) — the wall is ten schema introspections + tiny-frame shuffle
# scheduling, the catalog class; zero corpus contact at any SF.
# ---------------------------------------------------------------------------
from mysql2psql_spark.sources.parquet import TABLES as _M8_TABLES

_M8_TABLES_IN = ", ".join(f"'{t}'" for t in _M8_TABLES)

_ORACLE_SCHEMA_EVOLUTION = f"""
    WITH v1 AS (
      SELECT table_name, column_name, CAST(ordinal_position AS INT) AS pos,
             -- DuckDB data_type -> IR vocabulary (s8's pinned map) -> the
             -- PostgreSQL type the ADD fragment carries; the reference's
             -- PsqlParser always emits typed DDL (libs/PsqlParser.py:476).
             CASE data_type
               WHEN 'BIGINT'    THEN 'bigint'
               WHEN 'INTEGER'   THEN 'integer'
               WHEN 'SMALLINT'  THEN 'smallint'
               WHEN 'DOUBLE'    THEN 'double precision'
               WHEN 'FLOAT'     THEN 'real'
               WHEN 'REAL'      THEN 'real'
               WHEN 'VARCHAR'   THEN 'varchar'
               WHEN 'TIMESTAMP' THEN 'timestamp'
               WHEN 'DATE'      THEN 'date'
               WHEN 'BOOLEAN'   THEN 'boolean'
               WHEN 'BLOB'      THEN 'bytea'
               ELSE 'varchar'
             END AS pg_type
      FROM information_schema.columns
      WHERE table_name IN ({_M8_TABLES_IN}) AND table_schema = CURRENT_SCHEMA()
    ),
    keep AS (
      SELECT table_name,
             CASE WHEN LENGTH(column_name) % 5 = 2
                  THEN 'r_' || column_name ELSE column_name END AS column_name,
             pos, pg_type
      FROM v1 WHERE LENGTH(column_name) % 7 != 3
    ),
    keep2 AS (
      SELECT table_name, column_name,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY table_name ORDER BY pos
             ) AS INT) AS pos,
             pg_type
      FROM keep
    ),
    v2 AS (
      SELECT * FROM keep2
      UNION ALL
      SELECT t.table_name, t.table_name || '_etl_ts',
             CAST(COALESCE(m.mp, 0) + 1 AS INT), 'timestamp'
      FROM (SELECT DISTINCT table_name FROM v1) t
      LEFT JOIN (SELECT table_name, MAX(pos) AS mp
                 FROM keep2 GROUP BY table_name) m
        ON m.table_name = t.table_name
    ),
    d AS (
      SELECT COALESCE(a.table_name, b.table_name) AS table_name,
             COALESCE(a.column_name, b.column_name) AS column_name,
             CASE WHEN a.column_name IS NULL THEN 'added'
                  WHEN b.column_name IS NULL THEN 'dropped'
                  WHEN a.pos != b.pos THEN 'moved' END AS change_type,
             a.pos AS pos_v1, b.pos AS pos_v2, b.pg_type AS pg_type_v2
      FROM v1 a FULL OUTER JOIN v2 b
        ON a.table_name = b.table_name AND a.column_name = b.column_name
    )
    SELECT table_name, column_name, change_type, pos_v1, pos_v2,
           CASE change_type
             WHEN 'dropped' THEN
               'ALTER TABLE "' || table_name || '" DROP COLUMN IF EXISTS "'
                 || column_name || '";'
             WHEN 'added' THEN
               'ALTER TABLE "' || table_name || '" ADD COLUMN "'
                 || column_name || '" ' || pg_type_v2 || ';'
           END AS ddl
    FROM d WHERE change_type IS NOT NULL
"""


@query("m8_schema_evolution_plan", oracle=_ORACLE_SCHEMA_EVOLUTION)
def m8_schema_evolution_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered ALTER plan between the live catalog (v1) and its
    rule-mutated v2 — see the block above."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from mysql2psql_spark import schema_ir as ir
    from mysql2psql_spark.sources.parquet import TABLES, load_table

    # IR vocabulary (schema_ir.from_dataframe, the s8-pinned feed) -> the
    # PostgreSQL type name the ADD fragment carries. The reference's
    # PsqlParser always emits typed DDL (libs/PsqlParser.py:476-511);
    # name-only ADD COLUMN is not valid PostgreSQL.
    ir_to_pg = {
        "bigint": "bigint",
        "int": "integer",
        "smallint": "smallint",
        "double": "double precision",
        "float": "real",
        "varchar": "varchar",
        "datetime": "timestamp",
        "date": "date",
        "boolean": "boolean",
        "blob": "bytea",
    }
    rows = []
    for t in TABLES:
        table = ir.from_dataframe(t, load_table(spark, sf_dir, t))
        for i, col in enumerate(table["columns"].values()):
            rows.append(
                (t, col["name"], i + 1, ir_to_pg.get(col["type"], "varchar"))
            )
    v1 = spark.createDataFrame(
        rows, "table_name string, column_name string, pos int, pg_type string"
    )
    return schema_evolution_plan_from(v1)


def schema_evolution_plan_from(v1: DataFrame) -> DataFrame:
    """The rule-mutation + name-keyed differ over an arbitrary v1
    catalog frame (table_name, column_name, pos, pg_type) — factored so
    the differ is property-testable beyond the fixture catalog (a
    pure-python replay over hypothesis-generated catalogs pins drops,
    renames, reindexing, the audit column, move classification, and the
    exact DDL strings)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    keep = v1.filter(F.length("column_name") % 7 != 3).select(
        "table_name",
        F.when(
            F.length("column_name") % 5 == 2,
            F.concat(F.lit("r_"), F.col("column_name")),
        )
        .otherwise(F.col("column_name"))
        .alias("column_name"),
        "pos",
        "pg_type",
    )
    keep2 = keep.select(
        "table_name",
        "column_name",
        F.row_number()
        .over(W.partitionBy("table_name").orderBy("pos"))
        .cast("int")
        .alias("pos"),
        "pg_type",
    )
    # the audit column lands on EVERY v1 table — derived from the
    # distinct table list, not from keep2: a table whose every column
    # the drop rule removes still gets its etl_ts at pos 1 (r16,
    # hypothesis counterexample {'t1': ['___']} — the keep2 groupBy
    # produced no row for an emptied table and the audit column
    # silently vanished from its v2)
    maxpos = keep2.groupBy("table_name").agg(
        F.max("pos").cast("int").alias("mp")
    )
    added = (
        v1.select("table_name")
        .distinct()
        .join(maxpos, "table_name", "left")
        .select(
            "table_name",
            F.concat(F.col("table_name"), F.lit("_etl_ts")).alias(
                "column_name"
            ),
            (F.coalesce(F.col("mp"), F.lit(0)) + 1).cast("int").alias("pos"),
            F.lit("timestamp").alias("pg_type"),
        )
    )
    v2 = keep2.unionByName(added)
    a = v1.alias("a")
    b = v2.alias("b")
    d = a.join(
        b,
        (F.col("a.table_name") == F.col("b.table_name"))
        & (F.col("a.column_name") == F.col("b.column_name")),
        "full_outer",
    ).select(
        F.coalesce(F.col("a.table_name"), F.col("b.table_name")).alias(
            "table_name"
        ),
        F.coalesce(F.col("a.column_name"), F.col("b.column_name")).alias(
            "column_name"
        ),
        F.when(F.col("a.column_name").isNull(), "added")
        .when(F.col("b.column_name").isNull(), "dropped")
        .when(F.col("a.pos") != F.col("b.pos"), "moved")
        .alias("change_type"),
        F.col("a.pos").alias("pos_v1"),
        F.col("b.pos").alias("pos_v2"),
        F.col("b.pg_type").alias("pg_type_v2"),
    )
    return d.filter(F.col("change_type").isNotNull()).select(
        "table_name",
        "column_name",
        "change_type",
        "pos_v1",
        "pos_v2",
        F.when(
            F.col("change_type") == "dropped",
            F.concat(
                F.lit('ALTER TABLE "'),
                F.col("table_name"),
                F.lit('" DROP COLUMN IF EXISTS "'),
                F.col("column_name"),
                F.lit('";'),
            ),
        )
        .when(
            F.col("change_type") == "added",
            F.concat(
                F.lit('ALTER TABLE "'),
                F.col("table_name"),
                F.lit('" ADD COLUMN "'),
                F.col("column_name"),
                F.lit('" '),
                F.col("pg_type_v2"),
                F.lit(";"),
            ),
        )
        .alias("ddl"),
    )
