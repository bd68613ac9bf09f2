"""Structured Streaming ops: each streaming run must equal its batch twin
on the same bounded input (the Structured Streaming contract)."""

import pytest
from pyspark.sql import functions as F

from traject_spark.corpus import fingerprint_expr
from traject_spark.streaming import (
    batch_sessionize,
    hourly_rollup,
    read_events_stream,
    run_stream_to_table,
    sessionize_stream,
    stream_dedup,
    stream_user_totals,
)
from traject_spark.streaming.ops import read_events_batch

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_rollup_stream_matches_batch(spark):
    got = run_stream_to_table(
        hourly_rollup(read_events_stream(spark, SF)), "t_hourly"
    )
    want = hourly_rollup(read_events_batch(spark, SF))
    cols = ["hour_epoch", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)
    assert len(_rows(got, cols)) > 0


def test_sessionize_stream_matches_batch(spark):
    got = run_stream_to_table(sessionize_stream(spark, SF), "t_sessions")
    want = batch_sessionize(spark, SF)
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)
    # gap splitting really happened: more sessions than users
    n_users = want.select("user_id").distinct().count()
    assert want.count() > n_users


def test_stream_dedup_fingerprints(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(f"{SF}/documents.[p]arquet")
        .select(fingerprint_expr(F.col("text")).alias("fingerprint"))
    )
    got = run_stream_to_table(
        stream_dedup(stream, "fingerprint"), "t_dedup", output_mode="append"
    )
    want = docs.select(
        fingerprint_expr(F.col("text")).alias("fingerprint")
    ).distinct()
    assert _rows(got, ["fingerprint"]) == _rows(want, ["fingerprint"])


def test_stream_user_totals_stateful(spark, tmp_path):
    got = run_stream_to_table(
        stream_user_totals(read_events_stream(spark, SF)),
        "t_totals",
        output_mode="update",
        checkpoint=str(tmp_path / "ckpt"),
    )
    # latest update per user must equal the batch aggregate
    want = (
        read_events_batch(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 2))
         for r in got.collect()}
    w = {r["user_id"]: (r["n_events"], round(r["total_value"], 2))
         for r in want.collect()}
    assert g == w


def test_stream_dedup_watermarked_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark twin: on the bounded events stream,
    the watermarked dedup output has no duplicate keys and matches the
    unbounded dedup's distinct-key set (every key's first arrival)."""
    from traject_spark.streaming import (
        read_events_batch,
        read_events_stream,
        run_stream_to_table,
        stream_dedup_watermarked,
    )

    sf = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf).selectExpr(
        "ts", "user_id % 50 AS key", "event_id"
    )
    out = run_stream_to_table(
        stream_dedup_watermarked(stream, "key", late="10 years"),
        "t_dedup_wm",
        output_mode="append",
    ).collect()
    keys = [r["key"] for r in out]
    assert len(keys) == len(set(keys)), "no duplicate keys in output"
    batch_keys = {
        r["key"]
        for r in read_events_batch(spark, sf)
        .selectExpr("user_id % 50 AS key")
        .distinct()
        .collect()
    }
    assert set(keys) == batch_keys


def test_stream_foreach_batch_to_solr(spark, tmp_path):
    """The README's streaming->Solr composition: a bounded event stream
    aggregated with a watermark, foreachBatch'd into the batched Solr
    sink (writers.solr_json_writer) — asserts the docs actually arrive
    at the mock endpoint."""
    import http.server
    import json
    import threading

    from pyspark.sql import functions as F

    from traject_spark.streaming.ops import hourly_rollup, read_events_stream
    from traject_spark.writers import solr_json_writer

    received, lock = [], threading.Lock()

    class _Solr(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                received.extend(json.loads(body))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Solr)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/solr/core"
    try:
        rollup = hourly_rollup(
            read_events_stream(spark, "/root/testdata/sf0.001")
        )
        docs = rollup.select(
            F.concat(
                F.col("hour_epoch").cast("string"),
                F.lit("-"),
                F.coalesce(F.col("event_type"), F.lit("none")),
            ).alias("record_id"),
            F.col("n_events"),
        )

        def sink(batch_df, _batch_id):
            solr_json_writer(batch_df, url, batch_size=50, max_skipped=0)

        q = (
            docs.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        srv.shutdown()

    assert received, "no documents reached the Solr mock"
    # the sink maps the record_id column to Solr's doc id field
    ids = {d["id"] for d in received}
    assert all("-" in i and i.split("-", 1)[0].isdigit() for i in ids)
    # cross-check against the batch rollup, watermark-aware: append mode
    # only emits windows the 2h watermark has passed, so windows ending
    # after (max event time - 2h) legitimately stay in state when the
    # bounded stream ends
    from traject_spark.streaming.ops import read_events_batch

    ev = read_events_batch(spark, "/root/testdata/sf0.001")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    groups = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .select(
            F.concat(
                F.unix_timestamp("w.start").cast("string"),
                F.lit("-"),
                F.coalesce(F.col("event_type"), F.lit("none")),
            ).alias("id"),
            F.col("w.end").alias("w_end"),
        )
        .collect()
    )
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=2)
    expected = {r["id"] for r in groups if r["w_end"] <= cutoff}
    held_back = {r["id"] for r in groups} - expected
    assert expected <= ids, sorted(expected - ids)[:5]
    assert ids <= expected | held_back, sorted(ids - expected - held_back)[:5]
