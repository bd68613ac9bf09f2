#!/usr/bin/env python
"""r15 cosine_near_dup(mode='lsh') formulation A/B.

The first r15 attempt moved the multi-table pair de-dup AFTER scoring
(to kill the SortAggregate that shuffled both 64-float vectors per
candidate) — and the lane got 2.7x SLOWER: near-identical vectors
collide in ALL `tables` hash tables, so scoring-before-dedup multiplies
the per-pair dot product by ~tables, and the interpreted HOF dot
(aggregate(zip_with(...)), ~128 lambda invocations per pair) is the
dominant per-pair cost.

Variants (outputs cross-checked identical before timing):
  early_hof        original shape: dedup payloads first, HOF dot once
  narrow_hof       score all candidates (HOF dot), dedup narrow rows
  early_unrolled   dedup payloads first, UNROLLED dot (codegen, no HOF)
  narrow_unrolled  score all (unrolled dot), dedup narrow rows

The unrolled dot is valid here because the lsh path enforces
size == dim; its fold order (0.0 + t0) + t1 ... is bit-identical to
dot_expr's aggregate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from traject_spark.corpus.similarity import (
    _banded, _usable_vec, dot_expr, norm_expr,
)

DIM, BITS, TABLES, THRESHOLD = 64, 4, 4, 0.35


def _dot_unrolled(a, b, dim):
    s = F.lit(0.0)
    for i in range(dim):
        s = s + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return s


def build(df, dedup_early: bool, unrolled: bool):
    vec = F.col("embedding")
    valid = _usable_vec(vec) & (F.size(vec) == DIM)
    a = df.filter(valid).select(
        F.col("vec_id").alias("id_a"), vec.alias("va"),
        norm_expr(vec).alias("na"),
    )
    b = df.filter(valid).select(
        F.col("vec_id").alias("id_b"), vec.alias("vb"),
        norm_expr(vec).alias("nb"),
    )
    pairs = (
        _banded(a, "id_a", "id_a", "va", "va", DIM, BITS, TABLES,
                extra=("na",))
        .join(
            _banded(b, "id_b", "id_b", "vb", "vb", DIM, BITS, TABLES,
                    extra=("nb",)),
            ["table", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    if dedup_early:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    dot = (
        _dot_unrolled(F.col("va"), F.col("vb"), DIM)
        if unrolled
        else dot_expr(F.col("va"), F.col("vb"))
    )
    scored = (
        pairs.withColumn(
            "cos", F.round(dot / (F.col("na") * F.col("nb")), 9)
        )
        .filter(~F.isnan(F.col("cos")) & (F.col("cos") >= THRESHOLD))
        .select("id_a", "id_b", F.round("cos", 6).alias("score"))
    )
    if not dedup_early:
        scored = scored.dropDuplicates(["id_a", "id_b"])
    return scored


def build_fetch(df):
    """5th variant (added after the first four were measured): de-dup the
    NARROW (id_a, id_b) candidate pairs first — banding carries only ids,
    so the multi-table de-dup is a HashAggregate over two longs instead
    of a SortAggregate over 1 KB payload rows — then fetch vectors+norms
    by two id-keyed joins and score ONCE per unique pair (same dot count
    as early_hof, unlike the rejected narrow_hof which scored every
    candidate)."""
    vec = F.col("embedding")
    valid = _usable_vec(vec) & (F.size(vec) == DIM)
    vf = df.filter(valid)
    pairs = (
        _banded(vf, "vec_id", "id_a", "embedding", None, DIM, BITS, TABLES)
        .join(
            _banded(vf, "vec_id", "id_b", "embedding", None, DIM, BITS,
                    TABLES),
            ["table", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    a = vf.select(
        F.col("vec_id").alias("id_a"), vec.alias("va"),
        norm_expr(vec).alias("na"),
    )
    b = vf.select(
        F.col("vec_id").alias("id_b"), vec.alias("vb"),
        norm_expr(vec).alias("nb"),
    )
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "cos",
            F.round(
                dot_expr(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                9,
            ),
        )
        .filter(~F.isnan(F.col("cos")) & (F.col("cos") >= THRESHOLD))
        .select("id_a", "id_b", F.round("cos", 6).alias("score"))
    )


VARIANTS = {
    "early_hof": (True, False),
    "narrow_hof": (False, False),
    "early_unrolled": (True, True),
    "narrow_unrolled": (False, True),
}


def main() -> None:
    spark = bench.session()
    emb = spark.read.parquet(f"{bench.SF_DIR}/embeddings.parquet")
    base = None
    for name, (de, un) in VARIANTS.items():
        rows = sorted(
            (r["id_a"], r["id_b"], r["score"])
            for r in build(emb, de, un).collect()
        )
        if base is None:
            base = rows
            print(f"cross-check base: {len(rows)} pairs")
        else:
            assert rows == base, f"{name} diverges"
    print("all variants identical")
    runs = {n: [] for n in VARIANTS}
    order = list(VARIANTS)
    for i in range(5):
        order = order[::-1]
        for name in order:
            de, un = VARIANTS[name]
            spark._jvm.System.gc()
            t0 = time.time()
            bench.noop(build(emb, de, un))
            runs[name].append(round(time.time() - t0, 3))
    for n, rs in runs.items():
        print(f"{n:16s} min {min(rs):6.3f} med {sorted(rs)[len(rs)//2]:6.3f} {rs}")
    spark.stop()


if __name__ == "__main__":
    main()
