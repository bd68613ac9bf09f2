#!/usr/bin/env python
"""r16 A/B: gopher_repetition_expr — JVM sorted-run aggregates (current)
vs a single Arrow pass (pandas_udf struct) computing all signals from
ONE tokenization (VERDICT r15 task #2, guide §4.2).

Cross-checks 0-diff on the full sf0.1 documents corpus FIRST (exact
equality on every struct field including 4dp rounding), then times both
formulations order-alternating with a noop sink.

Run: python tools/ab_repetition_r16.py [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main():
    spark = bench.session()
    from traject_spark.corpus import gopher_repetition_expr

    docs = spark.read.parquet(f"{bench.SF_DIR}/documents.parquet")

    jvm_out = docs.select(
        "doc_id",
        gopher_repetition_expr(F.col("text"), use_arrow=False).alias("r"),
    )
    arrow_out = docs.select(
        "doc_id",
        gopher_repetition_expr(F.col("text"), use_arrow=True).alias("r"),
    )

    # ---- 0-diff cross-check (exact equality, null-safe) -----------------
    a = jvm_out.alias("a")
    b = arrow_out.alias("b")
    joined = a.join(b, "doc_id", "full_outer")
    diff = joined.filter(
        ~(F.col("a.r").eqNullSafe(F.col("b.r")))
    )
    n_diff = diff.count()
    n_total = docs.count()
    print(f"AB cross-check: {n_total} docs, {n_diff} diffs", file=sys.stderr)
    if n_diff:
        for row in diff.limit(5).collect():
            print("DIFF", row, file=sys.stderr)
        sys.exit(1)

    # ---- timing, order-alternating --------------------------------------
    def run(df):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # warmup both
    run(jvm_out)
    run(arrow_out)
    times = {"jvm": [], "arrow": []}
    for i in range(PASSES):
        order = (
            [("jvm", jvm_out), ("arrow", arrow_out)]
            if i % 2 == 0
            else [("arrow", arrow_out), ("jvm", jvm_out)]
        )
        for name, df in order:
            spark._jvm.System.gc()
            times[name].append(run(df))
    for name, ts in times.items():
        ts_s = sorted(ts)
        print(
            f"AB {name}: min={ts_s[0]:.3f} med={ts_s[len(ts_s) // 2]:.3f} "
            f"runs={[round(t, 2) for t in ts]}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
