"""Streaming operators over the driver's `events` table.

Every operator here is expressed once as a DataFrame transform usable in
BOTH batch and streaming mode (the Structured Streaming promise): the
correctness gate checks the batch twin against DuckDB, and the streaming
tests assert stream-run == batch-run on the same input.

ts note: the driver's parquet stores `ts` as naive timestamp[us]; Spark
would read it as TIMESTAMP_NTZ, whose epoch extraction is session-timezone
dependent. The schemas here instead declare the column LONG, which the
parquet reader fills with the raw INT64 micros-since-epoch — a
timezone-free instant we convert with ``timestamp_micros`` (UTC semantics,
matching DuckDB's naive-as-UTC reading in the oracle).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def events_schema() -> StructType:
    """Schema of events.parquet with ts as raw micros (see module note)."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def _with_event_time(df: DataFrame) -> DataFrame:
    return df.withColumn("ts", F.timestamp_micros(F.col("ts")))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    ``maxFilesPerTrigger`` would bound micro-batch size on a real tail;
    with ``availableNow`` the source plans one bounded backfill run.
    """
    # file-stream source wants a directory or glob, not a bare file path
    raw = (
        spark.readStream.schema(events_schema())
        .format("parquet")
        .load(f"{sf_dir}/events.[p]arquet")
    )
    return _with_event_time(raw)


def read_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.schema(events_schema()).parquet(f"{sf_dir}/events.parquet")
    return _with_event_time(raw)


def hourly_rollup(events: DataFrame, late: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window rollup (streaming twin of the batch
    ``rel_events_hourly`` query). Watermark bounds window state: late
    events beyond ``late`` are dropped, finalized windows are evicted."""
    ev = events.withWatermark("ts", late) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SESSION_GAP = "30 minutes"


def sessionize(events: DataFrame, gap: str = SESSION_GAP,
               late: str = "1 hour") -> DataFrame:
    """Native ``session_window`` gaps-and-islands sessionization — one
    expression valid in batch and streaming. Events of one user separated
    by < gap merge into one session; state is keyed by (user, session) and
    merged by the streaming session-window state store.

    ``late`` bounds out-of-order tolerance (the watermark). Size it to at
    least the expected disorder of the source: events later than it are
    DROPPED by the streaming run while the batch twin would include
    them — the stream==batch parity claim only holds within the horizon.
    """
    ev = events.withWatermark("ts", late) if events.isStreaming else events
    return (
        ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("session_start"),
            F.unix_timestamp(F.col("sw.end")).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def batch_sessionize(spark: SparkSession, sf_dir: str,
                     gap: str = SESSION_GAP) -> DataFrame:
    return sessionize(read_events_batch(spark, sf_dir), gap)


def sessionize_stream(spark: SparkSession, sf_dir: str,
                      gap: str = SESSION_GAP,
                      late: str = "1 hour") -> DataFrame:
    return sessionize(read_events_stream(spark, sf_dir), gap, late)


def stream_dedup(df: DataFrame, *keys: str) -> DataFrame:
    """Streaming exact-dedup: keyed state holds one entry per seen key,
    first arrival wins (the streaming twin of corpus.exact_dedup). On an
    unbounded stream prefer ``stream_dedup_watermarked`` — this variant's
    state grows with distinct keys forever."""
    return df.dropDuplicates(list(keys))


def stream_dedup_watermarked(
    df: DataFrame, *keys: str, ts_col: str = "ts", late: str = "1 hour"
) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    evicts per-key state once the watermark passes it, so state is
    O(keys-per-watermark-window), not O(all keys ever) — the only dedup
    shape that survives an unbounded 100 TB stream. Duplicates arriving
    within the watermark horizon are suppressed; later re-occurrences
    (after eviction) pass through, which is the documented trade."""
    ev = df.withWatermark(ts_col, late) if df.isStreaming else df
    if ev.isStreaming:
        return ev.dropDuplicatesWithinWatermark(list(keys))
    return ev.dropDuplicates(list(keys))


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value) carried across micro-batches.

    Demonstrates the arbitrary-stateful escape hatch the reference's
    ``each_record`` closures would need (reference has no analog — its
    state is per-record only). State is sharded by user hash; Arrow
    batches keep the Python boundary vectorized.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    def update(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        # state carries the RAW running sum; rounding only on emit —
        # round-then-store would compound the rounding error across
        # micro-batches and drift from the batch twin
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_marc_to_solr(
    spark: SparkSession,
    input_path: str,
    pipeline,
    url: str,
    checkpoint: str,
    id_tag: str = "001",
    engine: str = "python",
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
    await_termination: bool = True,
    **solr_kwargs,
):
    """Streaming ingest parity for the flagship path: ``readStream``
    marc-in-json NDJSON -> ``pipeline.apply`` (the same narrow mapping
    select as batch) -> ``foreachBatch`` into the batch Solr sink.

    The checkpoint gives exactly-once FILE tracking (a restarted query
    never re-reads a completed micro-batch); the sink itself is
    at-least-once on task retry and idempotent via Solr upsert-by-id —
    the same contract as the batch writer. ``available_now=True`` drains
    everything currently in the directory then stops (the batch-parity
    mode, and what the CLI uses); ``False`` runs a continuous
    micro-batch query over a growing drop directory — pair it with
    ``max_files_per_trigger`` to bound batch size. ``await_termination``
    blocks until the query ends in EITHER mode (for continuous mode that
    is "forever, until stopped/failed" — the standard Structured
    Streaming driver-keepalive); pass ``await_termination=False`` to
    manage the query handle yourself, and keep the driver alive, or the
    unawaited continuous query dies when the script exits.

    ``max_skipped`` is a PER-PROCESS budget: the running skip count
    lives in driver memory, not in the checkpoint, so a
    checkpoint-restarted query starts a fresh allowance even though
    file progress resumes — total skipped docs across restarts can
    exceed one budget. Persist the count next to the checkpoint (and
    seed a smaller ``max_skipped``) if a cross-restart cap matters.

    Returns the StreamingQuery (already terminated when awaited and the
    query drained/stopped).
    """
    import sys as _sys

    from traject_spark.marc.io import read_marc_json_stream
    from traject_spark.writers import solr_commit, solr_json_writer

    src = read_marc_json_stream(
        spark, input_path, id_tag=id_tag, engine=engine,
        max_files_per_trigger=max_files_per_trigger,
    )
    out = pipeline.apply(src)
    # commit once at stream end, NOT per micro-batch: forwarding
    # commit_on_close into the per-batch writer would issue a full Solr
    # commit (minutes on a large core) after EVERY micro-batch
    commit_close = bool(solr_kwargs.pop("commit_on_close", False))
    max_skipped = solr_kwargs.pop("max_skipped", 0)
    skipped_total = [0]
    # ONE accumulator for the whole stream: PySpark's accumulator
    # registry retains every accumulator until context stop, so letting
    # the writer create one per micro-batch is an unbounded driver leak
    # on a continuous query (the writer returns per-call deltas, so the
    # skip accounting below is unchanged)
    stream_acc = spark.sparkContext.accumulator(0)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # max_skipped is a PER-RUN budget like the batch path's (the
        # reference aborts after max_skipped total, not per write call):
        # each micro-batch gets only the remaining allowance, so N
        # batches cannot silently lose N x max_skipped docs
        remaining = (
            None
            if max_skipped is None
            else max(0, max_skipped - skipped_total[0])
        )
        n = solr_json_writer(
            batch_df, url, max_skipped=remaining,
            skipped_accumulator=stream_acc, **solr_kwargs
        )
        if n:
            # surface per-batch losses: the batch path returns this count
            # to its caller; a streaming run must not lose it silently
            skipped_total[0] += n
            print(
                f"stream_marc_to_solr: batch {batch_id} skipped {n} "
                f"docs ({skipped_total[0]} total)",
                file=_sys.stderr,
            )

    writer = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if await_termination:
        q.awaitTermination()
        if commit_close:
            solr_commit(
                url,
                basic_auth_user=solr_kwargs.get("basic_auth_user"),
                basic_auth_password=solr_kwargs.get("basic_auth_password"),
            )
    elif commit_close:
        print(
            "stream_marc_to_solr: commit_on_close requires "
            "await_termination=True (the commit runs after the query "
            "ends) — ignored; use commitWithin via solr_update_args",
            file=_sys.stderr,
        )
    # expose the aggregate for callers holding the query handle
    q.skipped_docs = skipped_total
    return q


def run_stream_to_table(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
    checkpoint: Optional[str] = None,
) -> DataFrame:
    """Run a bounded stream to completion (availableNow) into an in-memory
    table and return it. Production sinks swap format for parquet/Kafka or
    ``foreachBatch`` into a batch writer (e.g. writers.solr_json_writer);
    the memory sink is the local test/correctness harness."""
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return sdf.sparkSession.table(name)
