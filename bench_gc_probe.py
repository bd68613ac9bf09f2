#!/usr/bin/env python
"""One-off probe: map_full_pipeline timing vs driver heap size + GC log.

Not part of the bench contract; used to diagnose the r4 regression.
Usage: PROBE_MEM=24g PROBE_GC=1 python bench_gc_probe.py
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_BENCH_RUNS", "1")

from pyspark.sql import SparkSession  # noqa: E402

import bench  # noqa: E402

MEM = os.environ.get("PROBE_MEM", "48g")
GC_LOG = os.environ.get("PROBE_GC", "")
N = int(os.environ.get("PROBE_N", "6"))


def session():
    b = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName("gc-probe")
        .config("spark.driver.memory", MEM)
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "30")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "2000")
    )
    flags = os.environ.get("PROBE_JVMFLAGS", "")
    if GC_LOG:
        tag = os.environ.get("PROBE_TAG", MEM)
        flags += f" -Xlog:gc*:file=/tmp/probe_gc_{tag}.log:time,uptime,level,tags"
    if flags.strip():
        b = b.config("spark.driver.extraJavaOptions", flags.strip())
    return b.getOrCreate()


def main():
    spark = session()
    t0 = time.time()
    bench.synth_marc(spark)
    print(f"setup: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    bench._full_pipeline().apply(bench.synth_marc(spark)).write.mode(
        "overwrite"
    ).format("noop").save()
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)
    runs = []
    for i in range(N):
        spark._jvm.System.gc()
        t0 = time.time()
        bench.b_map_full(spark)
        runs.append(round(time.time() - t0, 2))
        print(f"run {i}: {runs[-1]}s", file=sys.stderr)
    print(f"MEM={MEM} runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
