#!/usr/bin/env python
"""r15 simhash formulation A/B (guide §1.2 step 2: per-task work).

`simhash_expr` computes 64 per-bit majority votes as 64 separate
`filter(hashes, h -> (h >> i) & 1 = 1)` passes — Spark higher-order
functions are CodegenFallback (interpreted, per-element lambda
invocation), so a 50-token doc pays ~3200 lambda invocations.

Candidate `packed`: ONE aggregate pass over the hashes with 16 packed
longs, each holding 4 x 16-bit bit-counters; per token each counter long
adds `((h >>> 4j) & 0xF) * 0x200040008001 & 0x0001000100010001` (the
carry-free bit-spread multiply), i.e. one lambda invocation per token
with a wider body. Counts are extracted afterwards and the same majority
votes taken — bit-identical by construction for n_tokens <= 32767
(counter lanes cannot saturate, the top lane cannot overflow the signed
long under ANSI); docs above the guard take the original 64-pass path.

Outputs are cross-checked IDENTICAL row-for-row over the full corpus
before timing (the AB_FINDINGS discipline).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from traject_spark.expr import let
from traject_spark.corpus.textstats import tokens_expr
from traject_spark.corpus.dedup import simhash_expr

SPREAD = 0x200040008001          # 1 + 2^15 + 2^30 + 2^45
LANES = 0x0001000100010001       # bits 0, 16, 32, 48


def simhash_packed_expr(text):
    def packed_body(hashes, n):
        def step(acc, h):
            fields = []
            for j in range(16):
                x = F.shiftrightunsigned(h, 4 * j).bitwiseAND(F.lit(15))
                add = (x * F.lit(SPREAD)).bitwiseAND(F.lit(LANES))
                fields.append((acc[f"c{j}"] + add).alias(f"c{j}"))
            return F.struct(*fields)

        init = F.struct(
            *[F.lit(0).cast("long").alias(f"c{j}") for j in range(16)]
        )

        def finish(acc):
            sig = F.lit(0).cast("long")
            for i in range(64):
                j, k = divmod(i, 4)
                ones = F.shiftrightunsigned(acc[f"c{j}"], 16 * k).bitwiseAND(
                    F.lit(0xFFFF)
                )
                bit_val = (1 << i) if i < 63 else -(1 << 63)
                sig = sig + F.when(
                    ones * 2 > n, F.lit(bit_val).cast("long")
                ).otherwise(F.lit(0).cast("long"))
            return sig

        return F.aggregate(hashes, init, step, finish)

    return let(
        F.transform(tokens_expr(text), lambda t: F.xxhash64(t)),
        lambda hashes: F.when(
            hashes.isNotNull(),
            let(
                F.size(hashes),
                lambda n: F.when(
                    n <= 32767, packed_body(hashes, n)
                ).otherwise(_slow_body(hashes, n)),
            ),
        ),
    )


def _slow_body(hashes, n):
    sig = F.lit(0).cast("long")
    for i in range(64):
        ones = F.size(
            F.filter(
                hashes,
                lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
            )
        )
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        sig = sig + F.when(
            ones * 2 > n, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sig


def main() -> None:
    spark = bench.session()
    docs = spark.read.parquet(f"{bench.SF_DIR}/documents.parquet")

    cur = docs.select("doc_id", simhash_expr(F.col("text")).alias("sig"))
    new = docs.select(
        "doc_id", simhash_packed_expr(F.col("text")).alias("sig")
    )
    diff = (
        cur.alias("a")
        .join(new.alias("b"), "doc_id", "full")
        .filter(~F.col("a.sig").eqNullSafe(F.col("b.sig")))
        .count()
    )
    print(f"cross-check: {diff} differing rows (must be 0)")
    assert diff == 0

    variants = {"current": cur, "packed": new}
    runs = {name: [] for name in variants}
    for _ in range(5):
        for name, df in variants.items():
            spark._jvm.System.gc()
            t0 = time.time()
            bench.noop(df)
            runs[name].append(round(time.time() - t0, 3))
    for name, rs in runs.items():
        print(f"{name:8s} min {min(rs):6.3f}  med {sorted(rs)[len(rs)//2]:6.3f}  runs {rs}")
    spark.stop()


if __name__ == "__main__":
    main()
