#!/usr/bin/env python
"""r16 A/B (VERDICT r15 #4): score candidate pairs with a vectorized
Arrow dot (numpy, strict left-to-right accumulation = bit-identical to
the interpreted aggregate(zip_with(...)) HOF) vs the current JVM HOF dot,
on the embed_near_dup_lsh lane's exact query.

The numpy accumulation `acc += A[:, i] * B[:, i]` column by column
reproduces the HOF's evaluation order exactly (same IEEE adds in the
same order), so cos values and the 9dp threshold decision are
bit-identical; the division + round stay JVM-side either way.

Run: python tools/ab_embed_dot_r16.py [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def arrow_dot_udf(dim: int):
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dot(a, b):
        A = np.asarray(a.tolist(), dtype=np.float64)
        B = np.asarray(b.tolist(), dtype=np.float64)
        acc = np.zeros(len(A), dtype=np.float64)
        for i in range(dim):
            acc += A[:, i] * B[:, i]
        return pd.Series(acc)

    _dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_dot, "double")


def build(spark, use_arrow: bool):
    """cosine_near_dup(mode='lsh') with the scoring dot swapped."""
    from traject_spark.corpus import similarity as S

    emb = bench._embed_lsh_input(spark)
    df = emb
    threshold, dim, tables = 0.35, 64, 4
    vec = F.col("embedding")
    valid = S._usable_vec(vec) & (F.size(vec) == dim)
    a = df.filter(valid).select(
        F.col("vec_id").alias("id_a"), vec.alias("va"),
        S.norm_expr(vec).alias("na"),
    )
    b = df.filter(valid).select(
        F.col("vec_id").alias("id_b"), vec.alias("vb"),
        S.norm_expr(vec).alias("nb"),
    )
    bits = S.auto_lsh_bits(df.filter(F.size(vec) == dim).count())
    pairs = (
        S._banded(a, "id_a", "id_a", "va", "va", dim, bits, tables, extra=("na",))
        .join(
            S._banded(b, "id_b", "id_b", "vb", "vb", dim, bits, tables, extra=("nb",)),
            ["table", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = (
        arrow_dot_udf(dim)(F.col("va"), F.col("vb"))
        if use_arrow
        else S.dot_expr(F.col("va"), F.col("vb"))
    )
    return (
        pairs.withColumn("cos", F.round(dot / (F.col("na") * F.col("nb")), 9))
        .filter(~F.isnan(F.col("cos")) & (F.col("cos") >= 0.35))
        .select("id_a", "id_b", F.round("cos", 6).alias("score"))
    )


def main():
    spark = bench.session()
    jvm_out = build(spark, use_arrow=False)
    arrow_out = build(spark, use_arrow=True)

    key = ["id_a", "id_b"]
    j = jvm_out.alias("a").join(arrow_out.alias("b"), key, "full_outer")
    n_diff = j.filter(~F.col("a.score").eqNullSafe(F.col("b.score"))).count()
    n = jvm_out.count()
    print(f"AB cross-check: {n} pairs, {n_diff} diffs", file=sys.stderr)
    if n_diff:
        sys.exit(1)

    def run(df):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    run(jvm_out)
    run(arrow_out)
    times = {"jvm": [], "arrow": []}
    for i in range(PASSES):
        order = [("jvm", jvm_out), ("arrow", arrow_out)]
        if i % 2:
            order.reverse()
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
