"""Structured Streaming over the ``events`` fixture (SURVEY §1.5 / Tier-C).

The reference has no streaming surface; its snapshot log is an event
history, and the natural Spark extension is incremental processing via
Structured Streaming.  These queries drive a real streaming pipeline
(readStream → stateful agg → memory sink) to completion synchronously on
the batch fixture, so the driver can oracle-check the result: a tumbling
1-hour window aligned at the hour equals ``date_trunc('hour', ts)`` in
batch SQL.

At scale the same plan runs against a file/Kafka source with watermarks
bounding state; ``withWatermark`` is included so the state-cleanup path
is the one a production job would execute.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import dsum, query, sql_dsum


def _event_stream(spark: SparkSession, sf_dir: str):
    """readStream over events.parquet with the ns-timestamp workaround
    (same rebuild as registry.events_table, streaming flavor; the
    session-wide legacy conf flips only when the footer actually
    declares nanos)."""
    import pyarrow.parquet as _pq

    try:
        _ts = str(
            _pq.ParquetFile(f"{sf_dir}/events.parquet")
            .schema_arrow.field("ts")
            .type
        )
    except Exception:
        _ts = ""
    if _ts == "timestamp[ns]":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # event-time windows group on instants whose wall-clock rendering (and
    # the memory-sink→pandas conversion) depends on the session timezone;
    # pin UTC so results match the naive-timestamp oracle under any driver
    # session configuration.  SESSION-level and deliberately NOT restored:
    # the returned stream keeps running after this call, so a restore
    # would flip its semantics mid-query (get_spark sessions are already
    # UTC-pinned, making this a no-op there).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file streaming source insists on a directory; the fixture is a
    # single file.  Expose it through a per-sf_dir symlink directory
    # (no data copy).
    link_dir = os.path.join(
        tempfile.gettempdir(),
        "daskberg_stream_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    target = os.path.abspath(f"{sf_dir}/events.parquet")
    # lexists: a stale/broken symlink must be replaced, not tripped over.
    # Create-then-rename keeps concurrent first-time callers (parallel
    # test workers, two driver sessions) race-free: os.replace is atomic,
    # and a bare check-then-symlink would crash the loser with
    # FileExistsError.
    if (
        not os.path.lexists(link)
        or os.path.realpath(link) != os.path.realpath(target)
    ):
        tmp = link + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        os.symlink(target, tmp)
        os.replace(tmp, link)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(link_dir)
    )
    if dict(stream.dtypes)["ts"] == "bigint":
        # integer DIV (see registry.events_table); event-time ops require
        # TimestampType — with the session pinned to UTC the values match
        # the NTZ batch reads.
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dict(stream.dtypes)["ts"] == "timestamp_ntz":
        # Watermarks/event-time windows require TimestampType
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ).  The session TZ is
        # pinned UTC above, so NTZ→TIMESTAMP preserves the instant and the
        # naive-timestamp oracle still matches; window bounds are cast back
        # to NTZ at each query's output for schema parity with batch reads.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(
    agg: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "streaming_hourly_window",
    f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def streaming_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation as a real streaming query
    (stateful hash agg + watermark), drained synchronously to a memory
    sink; hour-aligned windows make it oracle-equivalent to the batch
    date_trunc aggregation."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
        )
    )
    out = _run_to_memory(agg, spark)
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
        "n",
        "sum_value",
    )


@query(
    "streaming_event_counts",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global streaming aggregation (complete mode) — the running-totals
    dashboard shape; distinct users tracked in state."""
    stream = _event_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("user_id").alias("n_users_approx"),
    )
    out = _run_to_memory(agg, spark)
    # exact distinct for the oracle comparison, approx kept in the stream
    # path as the scale-appropriate operator; recompute exact in batch is
    # not possible post-sink, so expose the streamed exactness contract:
    # n from the stream, n_users from a batch distinct (documents the
    # lambda-architecture reconciliation pattern).
    from daskberg_spark.operators.registry import table

    batch = table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return out.select("event_type", "n").join(batch, "event_type")


@query(
    "streaming_stateful_sessions",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with
    ``applyInPandasWithState`` — arbitrary per-key state (last event time,
    open-session count) carried across micro-batches.

    The state function is order-robust (sorts each batch, merges with the
    carried watermark-free state), so draining the fixture produces
    exactly the batch lag/gap sessionization the oracle computes.  At
    scale this is the template for any custom accumulating operator
    Catalyst lacks (CDC folding, per-entity ML feature state, ...)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _event_stream(spark, sf_dir)

    def sessionize(key, pdfs, state: GroupState):
        n_sessions, n_events, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        # vectorized: pandas ns → exact µs (no flooring to seconds —
        # fractional gaps just over 30min must still split); session
        # starts are where the gap to the previous event exceeds 30min,
        # plus the batch's first event checked against carried state.
        # A per-row Python loop here would dominate a hot key's
        # million-event micro-batch.
        micros = rows["ts"].astype("int64") // 1_000
        gap_us = 1800 * 1_000_000
        if len(micros):
            n_sessions += int((micros.diff().iloc[1:] > gap_us).sum())
            first = int(micros.iloc[0])
            if last_ts is None or first - last_ts > gap_us:
                n_sessions += 1
            last_ts = int(micros.iloc[-1])
            n_events += len(micros)
        state.update((n_sessions, n_events, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    agg = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="n_sessions long, n_events long, last_ts long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(agg, spark, output_mode="update")
    # update mode emits one row per key per batch; keep the final state
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )



@query(
    "streaming_foreach_batch_sink",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming sink via foreachBatch: each micro-batch
    overwrites an epoch-keyed parquet directory, so replays after failure
    are idempotent (epoch N rewrites epoch N, never duplicates).  The
    drained sink re-read + aggregate matches the batch oracle, proving no
    loss and no duplication across micro-batches."""
    out_dir = os.path.join(
        tempfile.gettempdir(), f"daskberg_fb_sink_{uuid.uuid4().hex[:8]}"
    )
    stream = _event_stream(spark, sf_dir)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = stream.writeStream.foreachBatch(write_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sunk = spark.read.parquet(out_dir)
    return sunk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
    )


@query(
    "streaming_dedup",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_first_events
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: ``dropDuplicates`` on (user_id,
    event_type) keeps each user's FIRST event of every type across
    micro-batches (keyed state), then a running count per type.  The
    surviving-row count per type equals the batch COUNT(DISTINCT user_id)
    oracle exactly, whatever the micro-batch slicing.

    At scale the dedup state is bounded with
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` (suppressing
    replays within the lateness bound instead of forever); the unbounded
    variant here matches the whole-fixture oracle."""
    stream = _event_stream(spark, sf_dir)
    deduped = stream.dropDuplicates(["user_id", "event_type"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_first_events")
    )
    out = _run_to_memory(agg, spark)
    return out.select("event_type", "n_first_events")


@query(
    "streaming_stream_join",
    """
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_attributed
    FROM c JOIN p ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY c.user_id
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    attribute each purchase to clicks by the same user within the
    preceding 30 minutes.  Both sides carry watermarks so the join state
    is provably bounded (Spark derives the state retention from the
    time-range predicate); the drained result equals the batch range-join
    oracle.  This is the canonical funnel/attribution shape a 100 TB
    event pipeline runs continuously."""
    stream = _event_stream(spark, sf_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = _run_to_memory(joined, spark, output_mode="append")
    return out.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_attributed")
    )


@query(
    "streaming_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` streaming aggregation: Spark's built-in
    gap-based session windows (state merges sessions as events arrive;
    watermark bounds retained state).  An event extends a session only if
    it lands strictly before the current end, so the batch oracle's
    new-session condition is gap >= 30 min — matching semantics exactly,
    not approximately.  Complements ``streaming_stateful_sessions``
    (the applyInPandasWithState custom-operator formulation of the same
    computation)."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, spark, output_mode="complete")
    return out.select(
        "user_id",
        F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
        "n_events",
    )


@query(
    "streaming_sliding_window",
    f"""
    WITH w AS (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTES, ts),
                     time_bucket(INTERVAL 30 MINUTES, ts)
                       - INTERVAL 30 MINUTES]) AS win_start,
             event_type, value
      FROM events
    )
    SELECT win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 'sum_value')}
    FROM w GROUP BY win_start, event_type
    """,
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation: 1-hour windows advancing
    every 30 minutes, so each event lands in exactly two overlapping
    windows (size/slide = 2).  The batch oracle materializes that fan-out
    explicitly — every event contributes to the 30-minute bucket it falls
    in and the one before it.

    Scale: Spark expands each row into size/slide window assignments
    before the stateful hash agg, so state is O(active_windows × types)
    and the watermark expires windows older than the lateness bound —
    the standard sliding-window cost model, not per-event state."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
        )
    )
    out = _run_to_memory(agg, spark)
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    )


def iceberg_epoch_sink(
    writer, partition_col=None, path_col=None, stats_every=0
):
    """foreachBatch callable committing each micro-batch to an Iceberg
    table exactly once: the epoch id keys the data directory (a replayed
    epoch overwrites its own files) and is recorded in the snapshot
    summary, so a replay whose snapshot already exists skips the
    metadata commit entirely — restart/retry can neither lose nor
    duplicate a batch.  Module-level so restart-time replay is testable
    outside a live query.

    ``partition_col``/``path_col`` follow ``commit_spark_output``'s
    convention for PARTITIONED tables: each micro-batch hive-partitions
    on ``path_col`` (a duplicate column carrying the TRANSFORMED value;
    Spark's partitionBy drops it from file contents) and the commit
    lifts the values under the spec field named by ``partition_col`` —
    so a streamed table prunes exactly like a batch-written one.

    ``stats_every=N`` keeps NDV statistics fresh on the streamed table:
    every N committed epochs, ``refresh_table_statistics`` runs — and a
    streaming sink is the incremental path's best case, since every
    commit in the window is a pure append, so the refresh unions the
    prior sketches with sketches over just the last N epochs' files.
    A stats failure never fails the epoch (the data commit already
    landed; stats are advisory) — it surfaces as a warning."""
    from daskberg_spark.iceberg.writer import (
        commit_spark_output,
        refresh_table_statistics,
    )

    committed = {"n": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if any(
            (s.get("summary") or {}).get("epoch-id") == str(epoch_id)
            for s in writer.snapshots
        ):
            return  # epoch already committed: replay is a no-op
        if batch_df.isEmpty():
            # an offset advance with no rows (e.g. a skipped non-append
            # snapshot upstream) must not mint empty snapshots forever
            return
        data_dir = os.path.join(writer.path, "data", f"epoch-{epoch_id}")
        w = batch_df.write.mode("overwrite")
        if path_col is not None:
            segs = [path_col] if isinstance(path_col, str) else list(path_col)
            w = w.partitionBy(*segs)
        w.parquet(data_dir)
        commit_spark_output(
            writer,
            data_dir,
            partition_col=partition_col,
            path_col=path_col,
            extra_summary={"epoch-id": str(epoch_id)},
        )
        committed["n"] += 1
        if stats_every and committed["n"] % stats_every == 0:
            try:
                refresh_table_statistics(writer, batch_df.sparkSession)
            except Exception as e:  # advisory: never fail a landed epoch
                import warnings

                warnings.warn(f"streaming stats refresh failed: {e}")

    return sink


def iceberg_upsert_sink(writer, on=None, partition_col=None, path_col=None):
    """foreachBatch callable UPSERTING each micro-batch into an Iceberg
    table exactly once — the CDC-apply sink: every batch becomes one
    blind equality-delete + data ``overwrite`` commit
    (``upsert_spark_output``; executors write both halves, the driver
    never sees a row), keyed on ``on`` or the table's declared
    identifier fields.  Epoch idempotence mirrors ``iceberg_epoch_sink``:
    the epoch id keys the output directories (a replayed epoch
    overwrites its own files) and is recorded in the snapshot summary,
    so a replayed epoch whose snapshot already exists skips the commit
    entirely."""
    from daskberg_spark.iceberg.writer import upsert_spark_output

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if any(
            (s.get("summary") or {}).get("epoch-id") == str(epoch_id)
            for s in writer.snapshots
        ):
            return  # epoch already committed: replay is a no-op
        if batch_df.isEmpty():
            return
        upsert_spark_output(
            writer,
            batch_df.sparkSession,
            batch_df,
            on=on,
            dir_token=f"epoch-{epoch_id}",
            extra_summary={"epoch-id": str(epoch_id)},
            partition_col=partition_col,
            path_col=path_col,
        )

    return sink


@query(
    "streaming_upsert_sink",
    """
    WITH final AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 5 = 0 THEN value + 2000
                  WHEN event_id % 3 = 0 THEN value + 1000
                  ELSE value END AS value
      FROM events
      WHERE event_id % 2 = 0 OR event_id % 3 = 0 OR event_id % 5 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM final GROUP BY event_type
    """,
)
def streaming_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT into the Iceberg layer (Flink-CDC shape): an
    upstream Iceberg table streams through the snapshot-tailing source
    into ``iceberg_upsert_sink``, which applies each micro-batch as ONE
    blind equality-delete + data commit on ``event_id`` — no target
    read, executors write both halves.  Three overlapping slices
    (ids divisible by 2, then by 3 with +1000, then by 5 with +2000)
    land as separate micro-batches; for every key the LAST slice
    containing it must win, which the oracle reconstructs with a
    priority CASE — exactness proves both the upsert semantics
    (strictly-older-sequence applicability) and exactly-once delivery
    across the stream."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter, commit_spark_output
    from daskberg_spark.operators.registry import table as _table
    from daskberg_spark.streaming.iceberg_source import register

    src_path = os.path.join(
        tempfile.gettempdir(), f"daskberg_upsert_src_{uuid.uuid4().hex[:8]}"
    )
    dst_path = os.path.join(
        tempfile.gettempdir(), f"daskberg_upsert_dst_{uuid.uuid4().hex[:8]}"
    )
    fields = [
        {"id": 1, "name": "event_id", "type": "long", "required": False},
        {"id": 2, "name": "event_type", "type": "string", "required": False},
        {"id": 3, "name": "value", "type": "double", "required": False},
    ]
    src_writer = IcebergWriter(src_path, fields)
    dst_writer = IcebergWriter(dst_path, fields)
    ev = _table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def commit_slice(k: int, mod: int, bump: float) -> None:
        d = os.path.join(src_path, "data", f"slice-{k}")
        ev.filter(F.col("event_id") % mod == 0).withColumn(
            "value", F.col("value") + F.lit(bump)
        ).write.mode("overwrite").parquet(d)
        commit_spark_output(src_writer, d)

    commit_slice(0, 2, 0.0)
    register(spark)
    q = (
        spark.readStream.format("daskberg_iceberg")
        .option("path", src_path)
        .load()
        .writeStream.foreachBatch(
            iceberg_upsert_sink(dst_writer, on=["event_id"])
        )
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: ids % 2
        commit_slice(1, 3, 1000.0)
        q.processAllAvailable()  # batch 2: ids % 3 overwrite
        commit_slice(2, 5, 2000.0)
        q.processAllAvailable()  # batch 3: ids % 5 overwrite
    finally:
        q.stop()
    t = IcebergTable(dst_path)
    return t.to_df(spark).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
    )


@query(
    "streaming_cdc_upsert",
    """
    WITH changes AS (
      SELECT event_type, 'insert' AS ct, value AS v
      FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_type, 'insert', value + 1000
      FROM events WHERE event_id % 3 = 0
      UNION ALL
      SELECT event_type, 'insert', value + 2000
      FROM events WHERE event_id % 5 = 0
      UNION ALL
      SELECT event_type, 'delete', value
      FROM events WHERE event_id % 2 = 0 AND event_id % 3 = 0
      UNION ALL
      SELECT event_type, 'delete',
             CASE WHEN event_id % 3 = 0 THEN value + 1000 ELSE value END
      FROM events
      WHERE event_id % 5 = 0 AND (event_id % 2 = 0 OR event_id % 3 = 0)
    )
    SELECT event_type, ct AS _change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM changes GROUP BY event_type, ct
    """,
)
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC STREAMING over blind equality-delete upserts — the two new
    surfaces composed: ``upsert_spark_output`` commits land on the
    upstream table (eq-delete + data, one snapshot each) and
    ``mode=cdc`` streams every commit as row-level changes, with
    executors re-deriving which parent-live rows each upsert killed
    (sequence-correct, prior-delete-aware).  The oracle reconstructs
    the exact change set relationally: the second upsert must delete
    the FIRST upsert's value for re-touched keys (value+1000), the
    original value for untouched-even keys, and nothing for keys
    already dead — any double-emission or missed carry-over breaks the
    per-type sums."""
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        commit_spark_output,
        upsert_spark_output,
    )
    from daskberg_spark.operators.registry import table as _table
    from daskberg_spark.streaming.iceberg_source import register

    path = os.path.join(
        tempfile.gettempdir(), f"daskberg_cdc_up_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
            {"id": 3, "name": "value", "type": "double", "required": False},
        ],
    )
    ev = _table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    d0 = os.path.join(path, "data", "slice-0")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(d0)
    commit_spark_output(writer, d0)
    register(spark)
    name = f"ice_cdc_up_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("daskberg_iceberg")
        .option("path", path)
        .option("mode", "cdc")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # backfill inserts
        for mod, bump in ((3, 1000.0), (5, 2000.0)):
            upsert_spark_output(
                writer,
                spark,
                ev.filter(F.col("event_id") % mod == 0).withColumn(
                    "value", F.col("value") + F.lit(bump)
                ),
                on=["event_id"],
            )
            q.processAllAvailable()  # upsert streams as delete+insert
    finally:
        q.stop()
    return spark.table(name).groupBy("event_type", "_change_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
    )


@query(
    "streaming_iceberg_sink",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_iceberg_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion INTO the Iceberg layer: each micro-batch is
    written by executors as parquet, then ``commit_spark_output`` lifts
    it into one append snapshot — the continuous-ingestion pattern that
    pairs Structured Streaming with the table format.  The drained table,
    read back through the connector (snapshot reconciliation over one
    snapshot per micro-batch), must match the batch oracle exactly: no
    loss, no duplication.

    Exactly-once: micro-batch epoch ids key the data directories (a
    replayed epoch overwrites its own files), AND each commit records its
    epoch in the snapshot summary — a replayed epoch whose snapshot
    already exists skips the metadata commit entirely, so failure/retry
    can neither lose nor duplicate a batch."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter

    path = os.path.join(
        tempfile.gettempdir(), f"daskberg_stream_sink_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
            {"id": 3, "name": "value", "type": "double", "required": False},
        ],
    )
    stream = _event_stream(spark, sf_dir).select("event_id", "event_type", "value")
    q = stream.writeStream.foreachBatch(iceberg_epoch_sink(writer)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    t = IcebergTable(path)
    import daskberg_spark.iceberg.scan  # noqa: F401

    return t.to_df(spark).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
    )


@query(
    "streaming_iceberg_source",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_iceberg_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FROM the Iceberg layer (the sink's missing half):
    ``spark.readStream.format("daskberg_iceberg")`` tails snapshots via
    the PySpark 4 Python Data Source API — offsets are snapshot ids,
    each micro-batch is the live-file diff, files read executor-side as
    Arrow batches.  Two appends land before the stream starts (initial
    backfill) and one MID-STREAM (incremental tail); the drained memory
    sink must equal the batch oracle over the same events exactly — no
    loss, no duplication across the backfill/tail boundary."""
    from daskberg_spark.iceberg.writer import IcebergWriter
    from daskberg_spark.streaming.iceberg_source import register

    path = os.path.join(
        tempfile.gettempdir(), f"daskberg_stream_src_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
            {"id": 3, "name": "value", "type": "double", "required": False},
        ],
    )
    from daskberg_spark.iceberg.writer import commit_spark_output
    from daskberg_spark.operators.registry import table as _table

    ev = _table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    # three deterministic slices, written DISTRIBUTED (executors produce
    # the parquet, commit_spark_output lifts footers): two pre-stream
    # appends, one mid-stream
    def commit_slice(k: int) -> None:
        d = os.path.join(path, "data", f"slice-{k}")
        ev.filter(F.col("event_id") % 3 == k).write.mode(
            "overwrite"
        ).parquet(d)
        commit_spark_output(writer, d)

    commit_slice(0)
    commit_slice(1)
    register(spark)
    name = f"ice_src_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("daskberg_iceberg")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # backfill: slices 0+1
        commit_slice(2)  # mid-stream append
        q.processAllAvailable()  # incremental tail
    finally:
        q.stop()
    return spark.table(name).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
    )


@query(
    "streaming_cdc_source",
    """
    SELECT event_type, _change_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT event_type, 'insert' AS _change_type FROM events
      UNION ALL
      SELECT event_type, 'delete' FROM events
      WHERE event_id % 3 IN (0, 1) AND event_id % 5 = 0
    ) GROUP BY event_type, _change_type
    """,
)
def streaming_cdc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC STREAMING from the Iceberg layer (``mode=cdc`` — beyond real
    Iceberg, whose streaming read is append-only): two distributed
    appends backfill as inserts, a mid-stream DELETION-VECTOR commit
    (``delete_where_dv_spark``) streams exactly the newly-dead rows as
    deletes (executor-side blob decode, new-minus-prior positions), and
    a post-delete append keeps streaming as inserts.  The drained memory
    sink, grouped by (event_type, _change_type), must equal the oracle's
    relational reconstruction of the same history — the deletes are the
    rows of the FIRST TWO slices matching the predicate, because the DV
    commit can only target files that existed when it ran."""
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        commit_spark_output,
        delete_where_dv_spark,
    )
    from daskberg_spark.operators.registry import table as _table
    from daskberg_spark.streaming.iceberg_source import register

    path = os.path.join(
        tempfile.gettempdir(), f"daskberg_cdc_src_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
        ],
    )
    ev = _table(spark, sf_dir, "events").select("event_id", "event_type")

    def commit_slice(k: int) -> None:
        d = os.path.join(path, "data", f"slice-{k}")
        ev.filter(F.col("event_id") % 3 == k).write.mode(
            "overwrite"
        ).parquet(d)
        commit_spark_output(writer, d)

    commit_slice(0)
    commit_slice(1)
    register(spark)
    name = f"ice_cdc_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("daskberg_iceberg")
        .option("path", path)
        .option("mode", "cdc")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # backfill inserts
        delete_where_dv_spark(writer, spark, "event_id % 5 = 0")
        q.processAllAvailable()  # DV deletes
        commit_slice(2)  # post-delete append
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).groupBy("event_type", "_change_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def _hll_sql_over_events() -> str:
    from daskberg_spark.operators.sketches import (
        HLL_M,
        HLL_REM_BITS,
        _sql_h48,
        _sql_rho,
    )
    from daskberg_spark.operators.sketches import HLL_ALPHA

    big = 1 << (HLL_REM_BITS + 1)
    c = HLL_ALPHA * float(HLL_M * HLL_M) * float(big)
    return f"""
    WITH parts AS (
      SELECT {_sql_h48('user_id')} >> {HLL_REM_BITS} AS idx,
             {_sql_h48('user_id')} & {(1 << HLL_REM_BITS) - 1} AS rem
      FROM events
    ), regs AS (
      SELECT idx, MAX({_sql_rho('rem')}) AS r FROM parts GROUP BY idx
    ), sk AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << ({HLL_REM_BITS + 1} - r))
                  AS BIGINT) AS t_present,
             CAST(COUNT(*) AS BIGINT) AS n_present
      FROM regs
    )
    SELECT CAST({HLL_M} - n_present AS BIGINT) AS n_empty,
           CAST(t_present + ({HLL_M} - n_present) * {big} AS BIGINT) AS t_sum,
           CAST({c!r} AS DOUBLE)
             / CAST(t_present + ({HLL_M} - n_present) * {big} AS DOUBLE)
             AS est_distinct,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
             AS exact_distinct
    FROM sk
    """


@query("streaming_distinct_hll", None)
def streaming_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog: distinct users counted across micro-batches
    with 256 registers as the ONLY streaming state.

    The register update (groupBy idx, MAX(rho)) runs as a stateful
    streaming aggregation — MAX is the HLL merge, so state size is fixed
    at 256 rows regardless of stream length; the finish (harmonic sum →
    estimate) is a batch reduction over the drained register table.
    Because the sketch is deterministic (sketches.approx_distinct_hll),
    the streaming result equals the batch query bit-for-bit — the
    replayable-sketch property that makes restart/retry safe at scale.

    Oracle registered lazily below: identical HLL SQL over the batch
    events view."""
    from daskberg_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_REM_BITS,
        _h48_spark,
        _sql_rho,
    )

    stream = _event_stream(spark, sf_dir)
    h = _h48_spark("user_id")
    parts = stream.select(
        F.shiftright(h, HLL_REM_BITS).alias("idx"),
        h.bitwiseAND(F.lit((1 << HLL_REM_BITS) - 1)).alias("rem"),
    )
    agg = parts.groupBy("idx").agg(F.max(F.expr(_sql_rho("rem"))).alias("r"))
    regs = _run_to_memory(agg, spark, "complete")
    sk = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REM_BITS + 1} - r)"))
        .cast("long")
        .alias("t_present"),
        F.count("*").alias("n_present"),
    )
    from daskberg_spark.operators.registry import table as _table

    exact = _table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    big = 1 << (HLL_REM_BITS + 1)
    t_sum = F.col("t_present") + (HLL_M - F.col("n_present")) * big
    est = (
        F.lit(HLL_ALPHA * float(HLL_M * HLL_M) * float(big))
        / t_sum.cast("double")
    )
    return sk.crossJoin(exact).select(
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_empty"),
        t_sum.cast("long").alias("t_sum"),
        est.alias("est_distinct"),
        "exact_distinct",
    )


@query("streaming_topk_countmin", None)
def streaming_topk_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min heavy hitters: the DEPTH×WIDTH counter grid is
    the ONLY streaming state (complete-mode grouped count — per-batch SUM
    is the count-min merge), drained and probed for the exact top-K
    users.  Like ``streaming_distinct_hll``, the sketch is a
    deterministic pure function of the data, so the streamed counters
    equal the batch sketch bit-for-bit whatever the micro-batch slicing —
    the replayable-sketch property that makes restart/retry safe.

    Oracle (registered below): the identical count-min construction in
    SQL over the batch events view."""
    from daskberg_spark.operators.sketches import (
        CM_DEPTH,
        CM_WIDTH,
        _h48_spark as h48_expr,
    )

    stream = _event_stream(spark, sf_dir)
    salted = [
        F.struct(
            F.lit(d).alias("d"),
            (
                h48_expr(
                    F.concat(F.col("user_id").cast("string"), F.lit(f"#{d}"))
                )
                % CM_WIDTH
            ).alias("bucket"),
        )
        for d in range(CM_DEPTH)
    ]
    parts = stream.select(F.explode(F.array(*salted)).alias("s")).select(
        F.col("s.d").alias("d"), F.col("s.bucket").alias("bucket")
    )
    agg = parts.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    sketch = _run_to_memory(agg, spark, "complete")

    from daskberg_spark.operators.registry import table as _table

    ev = _table(spark, sf_dir, "events")
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
    )
    probes = top.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            h48_expr(
                                F.concat(
                                    F.col("user_id").cast("string"),
                                    F.lit(f"#{d}"),
                                )
                            )
                            % CM_WIDTH
                        ).alias("bucket"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_n", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").cast("long").alias("est_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
    )


def _countmin_sql_over_events() -> str:
    from daskberg_spark.operators.sketches import (
        CM_DEPTH,
        CM_WIDTH,
        _cm_salted,
        _sql_h48,
    )

    user = "CAST(user_id AS VARCHAR)"
    bucket_case = " ".join(
        f"WHEN {d} THEN {_sql_h48(_cm_salted(user, d))} % {CM_WIDTH}"
        for d in range(CM_DEPTH)
    )
    return f"""
    WITH sketch AS (
      SELECT ds.d,
             CASE ds.d {bucket_case} END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS d) ds
      GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    probes AS (
      SELECT top.user_id, top.exact_n, ds.d,
             CASE ds.d {bucket_case} END AS bucket
      FROM top CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS d) ds
    )
    SELECT p.user_id, p.exact_n, CAST(MIN(s.c) AS BIGINT) AS est_n
    FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
    GROUP BY p.user_id, p.exact_n
    ORDER BY p.exact_n DESC, p.user_id
    """


@query(
    "streaming_rollup_sink",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_id
    FROM events GROUP BY event_type
    """,
)
def streaming_rollup_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion with a continuously-fresh materialized
    rollup (r11 composition: ``iceberg_epoch_sink`` × ``rollup.py``):
    the events table streams in four micro-batches, each epoch commits
    exactly-once into an Iceberg table, and the per-flag COUNT/SUM
    rollup advances INSIDE the stream — created on the first epoch,
    then refreshed per epoch through the changelog delta (append-only
    windows, so every refresh reads just that epoch's files).  The
    dashboard aggregate is never more than one micro-batch stale and
    no refresh ever rescans the table — the streaming half of the
    incremental-view-maintenance story.  Every refresh mode is
    asserted ``incremental``; the final rollup must equal the batch
    GROUP BY oracle exactly (no loss, no duplication, exactly-once
    composition)."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup
    from daskberg_spark.iceberg.writer import IcebergWriter

    # split the single-file fixture into 4 parquet files (cached per
    # sf_dir) so the file source triggers 4 micro-batches
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    split_dir = os.path.join(
        tempfile.gettempdir(), f"daskberg_stream_split_{tag}"
    )
    if not os.path.exists(os.path.join(split_dir, "_SUCCESS")):
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id", "event_type")
            .repartition(4, "event_id")
            .write.mode("overwrite")
            .parquet(split_dir)
        )
    schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    sink_path = os.path.join(
        tempfile.gettempdir(), f"daskberg_rusink_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        sink_path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
        ],
    )
    rollup_path = sink_path + "_rollup"
    epoch_sink = iceberg_epoch_sink(writer)
    state: dict = {"rw": None, "modes": []}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        epoch_sink(batch_df, epoch_id)
        if state["rw"] is None:
            state["rw"] = create_rollup(
                spark,
                IcebergTable(writer.path),
                rollup_path,
                ["event_type"],
                ["event_id"],
            )
        else:
            state["modes"].append(
                refresh_rollup(spark, state["rw"])["mode"]
            )

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state["rw"] is not None and len(state["modes"]) == 3, state
    assert all(m == "incremental" for m in state["modes"]), state
    out = IcebergTable(rollup_path).to_df(spark)
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_event_id").cast("long").alias("sum_id"),
    )


@query(
    "streaming_quantile_sink",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(event_id) AS BIGINT) AS nn,
           CAST(MIN(event_id) AS BIGINT) AS vmin,
           CAST(MAX(event_id) AS BIGINT) AS vmax
    FROM events
    """,
)
def streaming_quantile_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion with continuously-fresh quantile statistics
    (r12 composition: ``iceberg_epoch_sink`` × the mergeable per-file
    CDF partials): four micro-batches commit exactly-once into an
    Iceberg table, and ``refresh_quantile_statistics`` advances the
    histogram INSIDE the stream — every post-bootstrap epoch computes
    partials for ONLY that epoch's committed files (hard-asserted ==
    the epoch's file-count delta), never rescanning the table.  The
    CBO's range selectivity is thus never more than one micro-batch
    stale at O(epoch) maintenance cost.  The merged blob's censuses
    and extreme knots are exact, so the batch oracle must reproduce
    them."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    split_dir = os.path.join(
        tempfile.gettempdir(), f"daskberg_stream_split_{tag}"
    )
    if not os.path.exists(os.path.join(split_dir, "_SUCCESS")):
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id", "event_type")
            .repartition(4, "event_id")
            .write.mode("overwrite")
            .parquet(split_dir)
        )
    schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    sink_path = os.path.join(
        tempfile.gettempdir(), f"daskberg_qsink_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        sink_path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
        ],
    )
    epoch_sink = iceberg_epoch_sink(writer)
    state: dict = {"reps": [], "files": []}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        epoch_sink(batch_df, epoch_id)
        rep = refresh_quantile_statistics(
            writer, spark, ["event_id"] if not state["reps"] else None
        )
        state["reps"].append(rep)
        state["files"].append(rep["files_total"])

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(state["reps"]) == 4, state
    for i, rep in enumerate(state["reps"]):
        delta = state["files"][i] - (state["files"][i - 1] if i else 0)
        assert rep["partials_computed"] == delta and rep["dirty_files"] == 0, (
            i,
            rep,
        )
    hist = IcebergTable(sink_path).column_quantiles("event_id")
    assert hist["merged"] is True
    return spark.range(1).select(
        F.lit(hist["rows"]).cast("long").alias("n_rows"),
        F.lit(hist["nonnull"]).cast("long").alias("nn"),
        F.lit(int(round(hist["bounds"][0]))).cast("long").alias("vmin"),
        F.lit(int(round(hist["bounds"][-1]))).cast("long").alias("vmax"),
    )


@query(
    "streaming_ndv_sink",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS ndv
    FROM events GROUP BY event_type
    """,
)
def streaming_ndv_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion with continuously-fresh GROUPED NDV
    statistics (r13 composition: ``iceberg_epoch_sink`` × the per-file
    grouped theta partials): four micro-batches commit exactly-once
    into an Iceberg table, and ``refresh_grouped_theta_statistics``
    advances the per-event-type NDV blob INSIDE the stream — every
    post-bootstrap epoch builds sketch partials for ONLY that epoch's
    committed files (hard-asserted == the epoch's file-count delta),
    never rescanning the table.  "Distinct users by segment" is thus
    never more than one micro-batch stale at O(epoch) maintenance
    cost.  lg_k=16 keeps every group's sketch in exact mode at this
    scale, so ``ndv_groupby`` — served from the final merged blob with
    zero data files read — must match the batch COUNT(DISTINCT) oracle
    bit-for-bit."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    split_dir = os.path.join(
        tempfile.gettempdir(), f"daskberg_stream_split_{tag}"
    )
    if not os.path.exists(os.path.join(split_dir, "_SUCCESS")):
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id", "event_type")
            .repartition(4, "event_id")
            .write.mode("overwrite")
            .parquet(split_dir)
        )
    schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    sink_path = os.path.join(
        tempfile.gettempdir(), f"daskberg_ndvsink_{uuid.uuid4().hex[:8]}"
    )
    writer = IcebergWriter(
        sink_path,
        [
            {"id": 1, "name": "event_id", "type": "long", "required": False},
            {"id": 2, "name": "event_type", "type": "string", "required": False},
        ],
    )
    epoch_sink = iceberg_epoch_sink(writer)
    state: dict = {"reps": [], "files": []}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        epoch_sink(batch_df, epoch_id)
        if not state["reps"]:
            write_grouped_theta_statistics(
                writer, spark, ["event_type"], ["event_id"], lg_k=16
            )
        rep = refresh_grouped_theta_statistics(writer, spark)
        state["reps"].append(rep)
        state["files"].append(rep["files_total"])

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(state["reps"]) == 4, state
    for i, rep in enumerate(state["reps"]):
        delta = state["files"][i] - (state["files"][i - 1] if i else 0)
        assert rep["partials_computed"] == delta and rep["dirty_files"] == 0, (
            i,
            rep,
        )
    t = IcebergTable(sink_path)
    out = t.ndv_groupby(spark, "event_id", ["event_type"])
    assert t.last_ndv_groupby["route"] == "stats", t.last_ndv_groupby
    assert t.last_ndv_groupby["exact"] is True, t.last_ndv_groupby
    assert t.last_scan["files_scanned"] == 0, t.last_scan
    return out.select("event_type", F.col("ndv").cast("long").alias("ndv"))


# oracles need the sketch constants; register after the function bodies so
# the import graph stays acyclic
from daskberg_spark.operators.registry import ORACLES as _ORACLES

_ORACLES["streaming_distinct_hll"] = _hll_sql_over_events()
_ORACLES["streaming_topk_countmin"] = _countmin_sql_over_events()
