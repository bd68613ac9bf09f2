#!/usr/bin/env python
"""Scale the driver-generated testdata by an integer factor for soak runs.

Replicates each fact table ``factor`` times with primary/foreign keys
shifted per replica (FK relationships hold within every replica) and
keeps the fixed dimensions (region, nation) as-is. Documents and
embeddings DIVERGE with the replica index: replica k keeps the last
(factor-k)/factor of the text behind a fresh salt token, and blends the
vector toward its reversal with weight k/factor — so low-index replicas
are near-duplicates of the original while high-index replicas are
distinct. Each source doc therefore spawns a BOUNDED near-dup clique
(~2-3 docs) instead of factor-many copies; composed scale-ups stay
bounded too. Unbounded cliques make every pairwise near-dup operator's
output quadratic in clique size — a data property, not an engine one.

Usage:
    python tools/scale_testdata.py --src /root/testdata/sf0.1 \
        --dst /root/repo/.scratch/sf1 --factor 10

Everything runs as Spark jobs — no driver-side materialization — so the
same script produces sf10 from sf1 on a cluster.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed-size dimensions (TPC-H keeps them constant across SF)
COPY_TABLES = ["region", "nation"]
# key columns shifted by rep * (max+1) of the SOURCE table that owns them
KEY_OWNERS = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def _bounds(spark: SparkSession, src: str) -> dict[str, int]:
    """max+1 of every owning key, computed once from the source tables."""
    owners = {}
    for col, table in KEY_OWNERS.items():
        owners.setdefault(table, set()).add(col)
    out = {}
    for table, cols in owners.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        # user_id is owned by events but is not its primary key; bound
        # every listed column by its own max within the owning table
        row = df.agg(
            *[F.max(F.col(c.split(".")[-1])).alias(c) for c in cols
              if c in df.columns]
        ).collect()[0]
        for c in cols:
            if c in df.columns:
                out[c] = int(row[c]) + 1
    # o_custkey / l_* reuse the bound of the key they reference
    out["o_custkey"] = out["c_custkey"]
    out["l_orderkey"] = out["o_orderkey"]
    out["l_partkey"] = out["p_partkey"]
    out["l_suppkey"] = out["s_suppkey"]
    return out


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    return df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_rep")
    )


def scale_table(
    spark: SparkSession, src: str, name: str, factor: int, bounds: dict
) -> DataFrame:
    df = spark.read.parquet(f"{src}/{name}.parquet")
    if name in COPY_TABLES or factor == 1:
        return df
    rep = _replicate(df, factor)
    cols = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if field.name in bounds:
            c = (c + F.col("_rep") * F.lit(bounds[field.name])).cast(
                field.dataType
            )
        cols.append(c.alias(field.name))
    out = rep.select(*cols, F.col("_rep"))
    if name == "documents":
        # divergence grows with the replica index: rep k keeps the last
        # (factor-k)/factor of the text behind a fresh salt token (module
        # docstring; the divisor is FACTOR, not a constant, so factors
        # beyond 10 can't substring past the end and collapse replicas
        # into exact-dup cliques)
        out = out.withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.concat(
                    F.lit("r"), F.col("_rep").cast("string"), F.lit("s"),
                    (F.col("doc_id") % 97).cast("string"), F.lit(" "),
                    F.substring(
                        F.col("text"),
                        (F.col("_rep") * F.length("text") / factor)
                        .cast("int") + 1,
                        F.length("text"),
                    ),
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings":
        # same idea in vector space: blend toward the reversed vector
        # (same norm, ~orthogonal direction) with weight rep/factor —
        # rep 1 stays a near-dup, high reps diverge, weight never
        # exceeds (factor-1)/factor < 1
        w = (F.col("_rep").cast("double") / float(factor))
        out = out.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.zip_with(
                    "embedding",
                    F.reverse("embedding"),
                    lambda a, b: (
                        a * (1.0 - w) + b * w
                    ).cast("float"),
                )
            ),
        )
    return out.drop("_rep")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("scale-testdata")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    bounds = _bounds(spark, args.src)
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        out = scale_table(spark, args.src, name, args.factor, bounds)
        n_parts = args.cpus if name not in COPY_TABLES else 1
        out.repartition(n_parts).write.mode("overwrite").parquet(
            f"{args.dst}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{args.dst}/{name}.parquet').count():,} rows")
    spark.stop()


if __name__ == "__main__":
    main()
