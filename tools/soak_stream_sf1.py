#!/usr/bin/env python
"""sf1 soak of ALL THREE streaming lanes (VERDICT r12 next-round #7).

r12 soaked `stream_late_data` at 10x; `stream_sessionize` and
`stream_dedup_fingerprint` had only sf0.1 oracle coverage. This replays
all three at sf1 (1M events, 50k docs) and asserts each against its
OWN DuckDB twin (the same SQL the driver's correctness gate runs),
with expected counts derived from the oracle — never hardcoded:

A. stream_late_data: rows match the drop-rule twin; the drop is real
   (0 < kept < total late rows).
B. stream_sessionize: rows match the gaps-and-islands twin; session
   merging is real (n_sessions < n_events).
C. stream_dedup_fingerprint: rows match the DISTINCT-fingerprint twin;
   the 10x replication guarantees duplicates, so kept < input rows.

Writes BENCH_sf1_stream_r13.json, one JSON line, driver-artifact style.

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


def build_sf1_table(spark, src: str, dst_dir: str, table: str,
                    key: str, n_files: int) -> None:
    """10x a table with its integer key shifted per replica (the same
    key-shift scheme tools/scale_testdata.py uses); all other columns
    kept, so the watermark/session/dup landscape is the sf0.1 one at
    10x density.

    ``n_files``: events MUST be one file — sf0.1's single file means
    one availableNow micro-batch, the NO-DROP regime the sessionize
    twin encodes (sessionize docs: stream==batch parity holds within
    the watermark horizon only). A multi-file layout replays files in
    arbitrary order across batches and the watermark legitimately
    drops stragglers (observed: 8 files -> 4 sessions short at sf1);
    the DROP regime has its own lane (stream_late_data), with ordered
    batches and a drop-rule twin. Documents stay multi-file — the
    dedup lane has no watermark and should exercise multi-file reads."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{src}/{table}.parquet")
    shift = df.agg(F.max(key)).collect()[0][0] + 1
    others = [c for c in df.columns if c != key]
    (
        df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_rep")
        )
        .select(
            (F.col(key) + F.col("_rep") * shift).alias(key), *others
        )
        .coalesce(n_files)
        .write.mode("overwrite")
        .parquet(os.path.join(dst_dir, f"{table}.parquet"))
    )


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for table in ("events", "documents"):
        path = f"{sf_dir}/{table}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


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
    build_sf1_table(spark, args.src, sf1_dir, "events", "event_id", n_files=1)
    build_sf1_table(spark, args.src, sf1_dir, "documents", "doc_id", n_files=8)
    setup_sec = round(time.time() - t0, 1)

    con = duck_con(sf1_dir)
    queries = entry.queries()
    oracle = entry.oracle_sql()
    payload = {
        "metric": "sf1_stream_soak",
        "sf": 1.0,
        "setup_sec": setup_sec,
        "events_rows": con.execute("SELECT count(*) FROM events").fetchone()[0],
        "documents_rows": con.execute(
            "SELECT count(*) FROM documents"
        ).fetchone()[0],
        "lanes": {},
    }
    failures = []
    for lane in (
        "stream_late_data", "stream_sessionize", "stream_dedup_fingerprint"
    ):
        t0 = time.time()
        got = queries[lane](spark, sf1_dir).collect()
        lane_sec = round(time.time() - t0, 1)
        cols = got[0].__fields__ if got else []
        spark_rows = canon([tuple(r[c] for c in cols) for r in got])
        duck = canon(con.execute(oracle[lane]).fetchall())
        ok = spark_rows == duck
        payload["lanes"][lane] = {
            "stream_sec": lane_sec,
            "result_rows": len(spark_rows),
            "oracle_rows": len(duck),
            "rows_match_oracle": ok,
        }
        if not ok:
            failures.append(lane)

    # lane-specific reality checks, expected counts from the oracle
    [(late_total,)] = con.execute(
        "SELECT count(*) FROM events WHERE event_id % 10 >= 8"
    ).fetchall()
    [(late_kept,)] = con.execute(
        """WITH a AS (SELECT * FROM events WHERE event_id % 10 < 7),
            wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM a)
           SELECT count(*) FROM events b, wm
           WHERE b.event_id % 10 >= 8
             AND date_trunc('hour', b.ts) + INTERVAL 1 HOUR > wm.w"""
    ).fetchall()
    payload["late_rows_total"] = late_total
    payload["late_rows_kept"] = late_kept
    payload["late_rows_dropped"] = late_total - late_kept
    n_sessions = payload["lanes"]["stream_sessionize"]["result_rows"]
    n_dedup = payload["lanes"]["stream_dedup_fingerprint"]["result_rows"]

    print(json.dumps(payload))
    with open(os.path.join(REPO, "BENCH_sf1_stream_r13.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    assert not failures, f"sf1 lanes diverge from DuckDB twins: {failures}"
    assert 0 < late_kept < late_total, (
        "watermark drop vacuous or total at sf1", late_kept, late_total
    )
    assert 0 < n_sessions < payload["events_rows"], (
        "sessionize produced no merging at sf1", n_sessions
    )
    assert 0 < n_dedup < payload["documents_rows"], (
        "streaming dedup dropped nothing at sf1 (10x replication must "
        "produce duplicates)", n_dedup
    )
    print(
        f"SOAK OK: 3/3 sf1 streaming lanes match their DuckDB twins "
        f"(dropped {late_total - late_kept}/{late_total} late rows, "
        f"{n_sessions} sessions, {n_dedup} distinct fingerprints of "
        f"{payload['documents_rows']} docs)",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
