#!/usr/bin/env python
"""Scale the driver-generated testdata by an integer factor for soak runs.

Replicates each fact table ``factor`` times with primary/foreign keys
shifted per replica (FK relationships hold within every replica) and
keeps the fixed dimensions (region, nation) as-is. Documents and
embeddings form DESIGNED near-dup cliques whose size is independent of
``factor``: replicas 0-2 are mutual near-duplicates (rep 1 = salt token
prepended; rep 2 = salt + ~5% deterministic token drop / ~4% sign
flips), while every replica >= 3 diverges from the original AND from
every other replica: a rep-specific pseudo-random HALF of the tokens is
REPLACED with per-doc-unique noise tokens — replacement (not deletion)
is load-bearing, because SimHash's per-bit majority vote survives a
token DROP almost intact (a 1/3 drop left replica groups ~10 hamming
bits apart, quadratic candidate volume for banded hamming at factor
100) while half-noise pushes pairwise distance to ~20+ bits AND crushes
shingle Jaccard; vectors flip a rep-specific pseudo-random half of
their signs — pairwise cosine ~ 0. Divergence schemes parameterized by a
single continuous knob (suffix length, blend weight) are a trap: any
dense sampling of a 1-parameter family puts adjacent replicas within
any fixed similarity threshold, so the clique grows linearly with
``factor`` and pairwise near-dup output becomes quadratic — a data
property, not an engine one.

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
        # designed cliques (module docstring): rep 1 = salt only (shingle
        # overlap ~1); rep 2 = salt + drop every 20th token (~(19/20)^3
        # ~ 0.86 of shingles survive — inside a 0.8 near-dup threshold,
        # and a 5% drop moves SimHash only a bit or two); reps >= 3
        # REPLACE a rep-specific pseudo-random half of the tokens with
        # per-doc-unique noise — divergent under BOTH shingle Jaccard
        # (~0) and SimHash hamming (~20+ bits), unlike a bare drop
        toks = F.split(F.col("text"), " ")
        salt = F.concat(
            F.lit("r"), F.col("_rep").cast("string"), F.lit("s"),
            (F.col("doc_id") % 97).cast("string"), F.lit(" "),
        )
        kept_near = F.filter(toks, lambda t, i: (i % 20) != 19)
        noised_far = F.transform(
            toks,
            lambda t, i: F.when(
                F.pmod(F.xxhash64(i, F.col("_rep")), F.lit(2)) == 0,
                F.concat(
                    F.lit("z"), F.col("doc_id").cast("string"),
                    F.lit("r"), F.col("_rep").cast("string"),
                    F.lit("p"), i.cast("string"),
                ),
            ).otherwise(t),
        )
        out = out.withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text"))
            .when(
                F.col("_rep") == 1, F.concat(salt, F.col("text"))
            )
            .when(
                F.col("_rep") == 2,
                F.concat(salt, F.array_join(kept_near, " ")),
            )
            .otherwise(F.concat(salt, F.array_join(noised_far, " "))),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings":
        # same idea in vector space via sign flips (norm-preserving):
        # rep 1 flips ~2% of signs (cos ~ 0.96), rep 2 flips a superset
        # ~4% (cos ~ 0.92 to rep 0, ~0.96 to rep 1 — one bounded clique);
        # reps >= 3 flip a rep-specific pseudo-random HALF of the signs,
        # making them ~orthogonal to the original and to EACH OTHER
        # (E[cos] ~ 0) no matter how large factor grows
        def flip(pred):
            return F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda a, i: F.when(pred(i), -a).otherwise(a).cast("float"),
            )

        out = out.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding"))
            .when(
                F.col("_rep") == 1,
                flip(lambda i: F.pmod(F.xxhash64(i), F.lit(50)) == 0),
            )
            .when(
                F.col("_rep") == 2,
                flip(lambda i: F.pmod(F.xxhash64(i), F.lit(25)) == 0),
            )
            .otherwise(
                flip(
                    lambda i: F.pmod(
                        F.xxhash64(i, F.col("_rep")), F.lit(2)
                    ) == 0
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
