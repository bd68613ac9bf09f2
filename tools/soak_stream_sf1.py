#!/usr/bin/env python
"""sf1 soak of the watermark late-drop lane (VERDICT r11 next-round #6).

``stream_late_data`` is oracle-green at sf0.1, but its spacer-batch
construction (``__spark_entry__._late_arrival_dir``) leans on file
mtimes and ``maxFilesPerTrigger=1`` — mechanics that could be
sf-brittle. This soak replays the SAME query at 10x the events
(1M rows) and asserts:

A. the streamed result matches the DuckDB oracle twin row-for-row
   (same drop rule: hour-window end must exceed the eviction watermark
   advanced by the on-time bulk), i.e. the construction is not
   sf-dependent;
B. the drop is real and scales: kept-late row count < total late rows,
   with the expected counts derived from the oracle, not hardcoded.

Writes BENCH_sf1_stream_r12.json, one JSON line, driver-artifact style.

Usage:  python tools/soak_stream_sf1.py [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_sf1_events(spark, src: str, dst_dir: str) -> str:
    """10x the events table with event_id shifted per replica (the same
    key-shift scheme tools/scale_testdata.py uses); ts kept, so the
    watermark landscape is the sf0.1 one at 10x density."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{src}/events.parquet")
    shift = ev.agg(F.max("event_id")).collect()[0][0] + 1
    out = os.path.join(dst_dir, "events.parquet")
    (
        ev.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_rep"),
        )
        .select(
            (F.col("event_id") + F.col("_rep") * shift).alias("event_id"),
            "ts", "user_id", "event_type", "value", "props",
        )
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def duck_rows(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
        if os.path.isdir(f"{sf_dir}/events.parquet")
        else f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(sql).fetchall()


def canon(rows):
    return sorted(
        tuple(
            round(v, 6) if isinstance(v, float) else v for v in r
        )
        for r in rows
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    sf1_dir = tempfile.mkdtemp(prefix="sf1_stream_")
    t0 = time.time()
    build_sf1_events(spark, args.src, sf1_dir)
    setup_sec = round(time.time() - t0, 1)

    t0 = time.time()
    got = entry.queries()["stream_late_data"](spark, sf1_dir).collect()
    stream_sec = round(time.time() - t0, 1)

    oracle_sql = entry.oracle_sql()["stream_late_data"]
    want = duck_rows(sf1_dir, oracle_sql)

    spark_rows = canon(
        [(r["hour_epoch"], r["event_type"], r["n_events"], r["total_value"])
         for r in got]
    )
    duck = canon(want)
    rows_match = spark_rows == duck

    # the drop, derived from the oracle's own building blocks: total
    # late rows vs late rows the drop rule keeps
    [(late_total,)] = duck_rows(
        sf1_dir, "SELECT count(*) FROM events WHERE event_id % 10 >= 8"
    )
    [(late_kept,)] = duck_rows(
        sf1_dir,
        """WITH a AS (SELECT * FROM events WHERE event_id % 10 < 7),
            wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM a)
           SELECT count(*) FROM events b, wm
           WHERE b.event_id % 10 >= 8
             AND date_trunc('hour', b.ts) + INTERVAL 1 HOUR > wm.w""",
    )
    dropped = late_total - late_kept

    payload = {
        "metric": "sf1_stream_late_data",
        "sf": 1.0,
        "events_rows": 1_000_000,
        "setup_sec": setup_sec,
        "stream_sec": stream_sec,
        "result_rows": len(spark_rows),
        "oracle_rows": len(duck),
        "rows_match_oracle": rows_match,
        "late_rows_total": late_total,
        "late_rows_kept": late_kept,
        "late_rows_dropped": dropped,
    }
    print(json.dumps(payload))
    with open(os.path.join(REPO, "BENCH_sf1_stream_r12.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    assert rows_match, "sf1 streamed result diverges from the DuckDB twin"
    assert dropped > 0, "watermark dropped nothing at sf1 — lane is vacuous"
    assert late_kept > 0, (
        "watermark dropped ALL late rows at sf1 — drop rule off by an hour?"
    )
    print(
        f"SOAK OK: sf1 stream_late_data matches oracle "
        f"({len(duck)} rows), dropped {dropped}/{late_total} late rows",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
