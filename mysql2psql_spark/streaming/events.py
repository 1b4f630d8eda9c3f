"""Structured Streaming twins of the batch event queries.

The batch implementations (queries/events_q.py) define the semantics and
are oracle-checked; these wire the SAME aggregations through readStream
with watermarks, so the engine runs identically over a live stream. Tests
drive them with the file source + memory sink and processAllAvailable()
(deterministic: the whole fixture is one micro-batch replay).

Late data policy: 10-minute watermark — late events beyond it are dropped
from window aggregates; dropDuplicatesWithinWatermark bounds dedup state
the same way. State stores are keyed by (window, event_type) / user_id,
so state size is O(active windows x types), not O(events) — the shape
that survives unbounded streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql2psql_spark.operators.timeutil import epoch_of

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream (swap for kafka in production; schema contract
    identical)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def tumbling_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of queries/events_q.py::stream_tumbling_window."""
    ep = epoch_of(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(ep("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """session_window: the built-in stateful twin of the batch lag+cumsum
    sessionizer."""
    ep = epoch_of(events)
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            ep("w.start").alias("session_start"),
            "n_events",
        )
    )


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) maintained
    across micro-batches with ``applyInPandasWithState`` — the escape
    hatch for stateful logic the built-in windows can't express
    (equivalent batch semantics: groupBy(user).agg(count, sum)).

    State is one (long, double) pair per user — O(|users|), not
    O(|events|) — and each micro-batch touches only the users present in
    it, so state-store traffic scales with batch size. Arrow-batched:
    the Python worker sees whole pandas frames per key, never rows.
    """
    import pandas as pd  # local import: worker-side dependency

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """dropDuplicatesWithinWatermark on the event key — bounded-state
    streaming dedup (batch twin: stream_dedup_first)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of queries/events_q.py::stream_sliding_window:
    10-minute windows sliding every 5 — each event lands in 2 window
    states; state size is O(active windows)."""
    ep = epoch_of(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(ep("w.start").alias("win_start"), "n_events")
        .filter(F.col("win_start") >= 0)
    )


def attribution_join_stream(
    purchases: DataFrame, clicks: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of queries/events_q.py::stream_attribution_join —
    a watermarked stream-stream inner join. Both sides carry watermarks
    and the join condition bounds click age relative to the purchase, so
    the state store can expire clicks older than (watermark + 1 hour):
    bounded state on an unbounded stream, the property that makes
    stream-stream joins deployable."""
    ep_p = epoch_of(purchases)
    ep_c = epoch_of(clicks)
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        (ep_p("p_ts") - ep_c("c_ts")).alias("lag_seconds"),
    )


# ---------------------------------------------------------------------------
# Exactly-once CDC sink: the foreachBatch idempotent-write pattern.
# Structured Streaming guarantees at-least-once foreachBatch invocation
# with a stable batch_id; writing each micro-batch to a batch_id-keyed
# directory with mode=overwrite makes a RETRIED batch overwrite its own
# previous (possibly partial) output instead of appending duplicates —
# write-idempotence, which upgrades at-least-once to exactly-once
# end-to-end. compact_cdc_log then resolves the changelog exactly like
# the oracled batch twin (queries/migration_q.py::m4_cdc_apply): latest
# op per key wins, tombstones drop the key.
# ---------------------------------------------------------------------------
def cdc_foreach_batch_sink(out_dir: str, lineage: str | None = None):
    """Return a foreachBatch function writing each micro-batch to
    ``{out_dir}/batch=<id>`` idempotently (overwrite).

    Carries the SAME lineage/staleness guard as the drift/KS gates
    (r16, ADVICE — this was the one batch_id-versioned partial sink
    without it): a cleared-checkpoint restart whose batch 0 would
    silently shadow another lineage's partials is refused instead of
    corrupting the compacted changelog. Pass the checkpointLocation
    string (or any token that rotates with the query lineage) as
    ``lineage`` for the exact marker protocol; without it the batch-0
    stale-partial heuristic still applies."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _guard_versioned_out_dir(
            batch_df.sparkSession, out_dir, lineage, batch_id, gate="cdc sink"
        )
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return apply


def compact_cdc_log(spark, out_dir: str) -> DataFrame:
    """Resolve the batch-partitioned changelog into current state —
    identical semantics (and output schema) to m4_cdc_apply so the
    streaming path is pinned to the oracle-checked batch twin. One
    key-hash exchange; the per-key sort is history-sized."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{out_dir}/batch=*")
    ep = epoch_of(e)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
            "event_type",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
    )
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round(F.col("value").cast("decimal(12,4)"), 2).cast("double").alias("cur_value"),
        ep("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# Continuous aggregate maintenance (the streaming face of
# queries/migration_q.py::m5_agg_maintenance): a per-user materialized
# aggregate kept current by merging EACH micro-batch's partial aggregate
# into the stored view — never re-scanning history. Writes are
# batch_id-versioned (same idempotence discipline as
# cdc_foreach_batch_sink: a replayed batch overwrites its own version,
# and the reader takes the highest complete version), so at-least-once
# delivery still yields exactly-once view state. At 100 TB the merge
# joins two |users|-row frames per trigger; raw events are touched once,
# in their arrival batch.
# ---------------------------------------------------------------------------
def _hadoop_fs(spark, out_dir: str):
    """(FileSystem, Path, jvm) for ``out_dir`` resolved through Hadoop —
    the SAME filesystem Spark's own reads/writes use, so hdfs:// and
    s3a:// state dirs work identically to local paths. (An earlier
    os.listdir implementation silently returned [] on any non-local
    filesystem, which would have made every micro-batch overwrite the
    view with only its own partial aggregate — a silent state reset.)"""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def _complete_versions(spark, out_dir: str) -> list[int]:
    """Version ids whose write finished (Spark drops _SUCCESS at commit);
    a torn directory from a mid-write crash is invisible to readers and
    to the next batch's merge. Listed via the Hadoop FileSystem API so
    read/merge/prune agree with the writes on ANY supported filesystem."""
    fs, path, jvm = _hadoop_fs(spark, out_dir)
    if not fs.exists(path):
        return []
    versions = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("version="):
            success = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            if fs.exists(success):
                versions.append(int(name.split("=")[1]))
    return sorted(versions)


def continuous_agg_sink(out_dir: str, keep_versions: int = 2):
    """foreachBatch function maintaining {out_dir}/version=<batch_id>:
    the per-user (n_events, total_value) aggregate of everything seen
    through this batch = previous COMPLETE version ⊕ this batch's
    partial agg. Versions older than the newest ``keep_versions``
    complete ones are pruned after each commit (each version is a full
    state copy, so unbounded retention costs O(batches x users))."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).alias("total_value"),
        )
        prev_versions = [v for v in _complete_versions(spark, out_dir) if v < batch_id]
        if prev_versions:
            prev = spark.read.parquet(f"{out_dir}/version={prev_versions[-1]}")
            zero_n = F.lit(0).cast("bigint")
            zero_s = F.lit(0).cast("decimal(12,4)")
            merged = (
                prev.alias("b")
                .join(part.alias("d"), F.col("b.user_id") == F.col("d.user_id"), "full_outer")
                .select(
                    F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias("user_id"),
                    (
                        F.coalesce(F.col("b.n_events"), zero_n)
                        + F.coalesce(F.col("d.n_events"), zero_n)
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("b.total_value"), zero_s)
                        + F.coalesce(F.col("d.total_value"), zero_s)
                    ).alias("total_value"),
                )
            )
        else:
            merged = part
        merged.write.mode("overwrite").parquet(f"{out_dir}/version={batch_id}")
        fs, _, jvm = _hadoop_fs(spark, out_dir)
        for stale in _complete_versions(spark, out_dir)[:-keep_versions]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{out_dir}/version={stale}"), True)

    return apply


def read_continuous_agg(spark, out_dir: str) -> DataFrame:
    """Current state of the continuous aggregate: the highest COMPLETE
    version (torn mid-write directories are skipped). Before the first
    commit, an empty frame with the view schema."""
    versions = _complete_versions(spark, out_dir)
    if not versions:
        return spark.createDataFrame(
            [], "user_id bigint, n_events bigint, total_value double"
        )
    v = spark.read.parquet(f"{out_dir}/version={versions[-1]}")
    return v.select(
        "user_id",
        "n_events",
        F.round("total_value", 2).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Streaming PSI drift gate: the monitoring twin of
# queries/events_q.py::profile_drift_psi. Each micro-batch reduces to
# its (dim, bucket, period) COUNT partial (row-local given the FROZEN
# bounds frame — bins must not move between triggers) written
# batch_id-versioned (idempotent overwrite, the cdc_foreach_batch_sink
# replay discipline); the summary read sums the partials and runs the
# deterministic PSI tail. Counts are associative, so the compacted
# answer equals the one-shot batch query EXACTLY for ANY micro-batch
# partitioning of the same rows — the frame-for-frame equivalence
# tests/test_streaming.py pins through a real two-trigger readStream.
# Streaming state: ZERO (only bucket-sized count parquet accumulates).
# ---------------------------------------------------------------------------
def _read_lineage_marker(fs, jvm, marker_path) -> str | None:
    """Contents of the _LINEAGE marker file, or None if absent."""
    if not fs.exists(marker_path):
        return None
    stream = fs.open(marker_path)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _write_lineage_marker(fs, jvm, marker_path, lineage: str) -> None:
    out = fs.create(marker_path, True)
    try:
        out.write(bytearray(lineage.encode("utf-8")))
    finally:
        out.close()


def drift_counts_foreach_batch(
    bounds: DataFrame, out_dir: str, lineage: str | None = None
):
    """Return a foreachBatch function writing each micro-batch's
    (dim, bucket, period) count partial to {out_dir}/batch=<id>.
    ``bounds`` is the frozen 1-row bin-definition frame
    (operators/drift.py::drift_bounds over the reference window).

    LIFETIME CONTRACT: ``out_dir`` is coupled to the query's CHECKPOINT
    lineage, not to the gate object. The batch_id-versioned overwrite is
    idempotent only because a checkpointed restart replays the same ids;
    restarting with a NEW or cleared checkpoint restarts ids at 0, and
    an id-0 write over an out_dir that already holds another lineage's
    partials would silently shadow them under the same names, corrupting
    every future summary.

    ``lineage`` makes that refusal EXACT (r15, ADVICE): pass the token
    that names the checkpoint lineage (the checkpointLocation string is
    the natural choice — it survives restarts of the same query and
    changes exactly when the lineage does). The gate persists it to
    {out_dir}/_LINEAGE on the first write and refuses batch 0 whenever
    the recorded marker names a DIFFERENT lineage — including the case
    the dir holds only batch=0, which the partial-inference heuristic
    below cannot distinguish from a same-lineage first-trigger retry.
    Without ``lineage`` the gate falls back to that heuristic: batch 0
    arriving while batch>0 partials exist raises instead of overwriting.
    Either way: clear (or rotate) out_dir together with the checkpoint.
    A per-run subdirectory would NOT fix this: same-lineage replays
    would land in a fresh run dir and double-count the replayed
    trigger."""
    from mysql2psql_spark.operators.drift import drift_counts, drift_tagged
    from mysql2psql_spark.operators.timeutil import epoch_of

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _guard_versioned_out_dir(
            batch_df.sparkSession, out_dir, lineage, batch_id, gate="drift gate"
        )
        ep = epoch_of(batch_df)
        ev = batch_df.select(ep("ts").alias("et"), "event_type", "value")
        part = drift_counts(drift_tagged(ev, bounds))
        part.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return apply


def _guard_versioned_out_dir(
    spark, out_dir: str, lineage: str | None, batch_id: int, gate: str
) -> None:
    """The shared lineage/staleness guard of every batch_id-versioned
    partial sink (drift gate, KS gate, CDC sink): refuse a write that
    would silently shadow another lineage's partials, per the contract
    in :func:`drift_counts_foreach_batch`. The marker is written BEFORE
    the caller's partial write (r16, ADVICE): a crash between the two
    leaves a marker describing zero partials — which every summary read
    fails on LOUDLY (the batch=* glob matches nothing) — whereas the
    previous marker-after-partial order left a crashed batch 0 unmarked
    and then refused the legitimate same-lineage replay as 'unknown
    provenance', a replay-availability regression."""
    fs, path, jvm = _hadoop_fs(spark, out_dir)
    marker_path = jvm.org.apache.hadoop.fs.Path(out_dir + "/_LINEAGE")
    if lineage is not None:
        recorded = _read_lineage_marker(fs, jvm, marker_path)
        if recorded is not None and recorded != lineage:
            raise RuntimeError(
                f"{gate}: query lineage {lineage!r} writing batch "
                f"{batch_id} over {out_dir}, which belongs to lineage "
                f"{recorded!r}; the checkpoint was cleared or points "
                "elsewhere — overwriting would corrupt the summary. "
                "Clear or rotate out_dir with the checkpoint."
            )
        if recorded is None and batch_id == 0 and fs.exists(path):
            existing = [
                s.getPath().getName()
                for s in fs.listStatus(path)
                if s.getPath().getName().startswith("batch=")
            ]
            if existing:
                raise RuntimeError(
                    f"{gate}: lineage {lineage!r} starting at batch 0 "
                    f"over {out_dir}, which already holds unmarked "
                    f"partials {sorted(existing)} of unknown provenance — "
                    "overwriting would corrupt the summary. Clear or "
                    "rotate out_dir with the checkpoint."
                )
    elif batch_id == 0 and fs.exists(path):
        stale = [
            s.getPath().getName()
            for s in fs.listStatus(path)
            if s.getPath().getName().startswith("batch=")
            and s.getPath().getName() != "batch=0"
        ]
        if stale:
            raise RuntimeError(
                f"{gate}: fresh query lineage (batch 0) over "
                f"{out_dir} which already holds {sorted(stale)}; "
                "the checkpoint was cleared without clearing "
                "out_dir — overwriting would corrupt the summary. "
                "Clear or rotate out_dir with the checkpoint."
            )
    if lineage is not None and recorded is None:
        _write_lineage_marker(fs, jvm, marker_path, lineage)


# ---------------------------------------------------------------------------
# Streaming KS gate: the same versioned-partial decomposition as the PSI
# drift gate, for the two-sample KS statistic — (key, value, period)
# counts are associative given frozen bounds (operators/drift.py::
# ks_value_counts), so any micro-batch partitioning sums to the one-shot
# counts and read_ks_summary is bit-identical to the batch
# events_ks_drift over the same rows. Partials are per-trigger
# distinct-value-sized (sublinear in the stream); the long-stream
# roll-up-compaction contract is the same associativity.
# ---------------------------------------------------------------------------
def ks_counts_foreach_batch(
    bounds: DataFrame, out_dir: str, lineage: str | None = None
):
    """Return a foreachBatch function writing each micro-batch's
    (event_type, value, period) KS count partial to
    ``{out_dir}/batch=<id>``. Same lifetime/lineage contract as
    :func:`drift_counts_foreach_batch` (shared guard)."""
    from mysql2psql_spark.operators.drift import ks_tagged, ks_value_counts
    from mysql2psql_spark.operators.timeutil import epoch_of

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _guard_versioned_out_dir(
            batch_df.sparkSession, out_dir, lineage, batch_id, gate="ks gate"
        )
        ep = epoch_of(batch_df)
        ev = batch_df.select("event_type", "value", ep("ts").alias("et"))
        part = ks_value_counts(ks_tagged(ev, bounds))
        part.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return apply


def read_ks_summary(spark, out_dir: str) -> DataFrame:
    """KS statistic over everything the gate has seen: sum the
    per-batch count partials (associative) and run the shared KS tail —
    schema and values identical to events_ks_drift over the same rows.
    A one-period mid-stream read yields ks_num = 0 per key (defined
    partial, see ks_tail)."""
    from mysql2psql_spark.operators.drift import ks_tail

    schema = "event_type string, value double, period int, n bigint"
    parts = spark.read.schema(schema).parquet(f"{out_dir}/batch=*")
    summed = parts.groupBy("event_type", "value", "period").agg(
        F.sum("n").cast("bigint").alias("n")
    )
    return ks_tail(summed)


def read_drift_summary(spark, out_dir: str) -> DataFrame:
    """PSI summary over everything the gate has seen: sum the per-batch
    count partials (associative) and run the shared PSI tail — schema
    and values identical to profile_drift_psi over the same rows.

    Long-stream posture: one bucket-sized partial lands per trigger, so
    a months-long stream accumulates many tiny files under out_dir. The
    partials' ASSOCIATIVITY is also the maintenance contract: a periodic
    job may replace batch=[0..n] with their one summed partial (same
    schema) without changing any future summary — the standard
    roll-up-compaction every versioned-partial sink runs."""
    from mysql2psql_spark.operators.drift import drift_psi_tail

    schema = "dim string, bucket string, period int, n bigint"
    parts = spark.read.schema(schema).parquet(f"{out_dir}/batch=*")
    summed = parts.groupBy("dim", "bucket", "period").agg(
        F.sum("n").cast("bigint").alias("n")
    )
    return drift_psi_tail(summed)
