"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: the exactness baseline. The (small) query set is
  broadcast; the corpus side is a narrow scan computing cosine per row,
  then a per-query top-k via window rank. Shuffle = one repartition by
  query id of (corpus_rows x n_queries) scored rows — at 100 TB, bound
  n_queries or use the LSH variant.
- ``lsh_topk``: scale path. Random-hyperplane signs bucket both sides;
  only same-bucket candidates are scored (multi-probe over ``tables``
  independent hash tables to recover recall). Candidate volume is
  corpus/2^bits per table instead of the full corpus.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traject_spark.expr import let2


def dot_expr(a: Column, b: Column) -> Column:
    # cast each element to double BEFORE multiplying: float*float would
    # round at float precision and diverge from the SQL-oracle twin
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return let2(
        a,
        b,
        lambda x, y: dot_expr(x, y) / (norm_expr(x) * norm_expr(y)),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x narrow corpus scan.

    Returns (query_id, neighbor_id, score, rank), rank 1..k per query.
    """
    qid = query_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(qid).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity_expr(F.col("qvec"), F.col("cvec")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane(dim: int, bit: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (splitmix-style)."""
    vals = []
    state = (table * 1_000_003 + bit * 8191 + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        # map to [-1, 1)
        vals.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return vals


def signs_expr(vec: Column, dim: int, bits: int, table: int) -> Column:
    """Random-hyperplane signature: int bucket id from ``bits`` sign bits."""
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        plane = _hyperplane(dim, b, table)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, h: (x * h).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH candidate buckets,
    exact rescoring of candidates only. Returns (query_id, neighbor_id,
    score, rank) — an ANN result, NOT guaranteed equal to brute force."""
    def with_buckets(df: DataFrame, idname: str) -> DataFrame:
        rows = []
        for t in range(tables):
            rows.append(
                df.select(
                    F.col(id_col).alias(idname),
                    F.col(vec_col).alias(f"{idname}_vec"),
                    F.lit(t).alias("table"),
                    signs_expr(F.col(vec_col), dim, bits, t).alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        return out

    cb = with_buckets(corpus, "neighbor_id")
    qb = F.broadcast(with_buckets(queries, "query_id"))
    cand = (
        cb.join(qb, ["table", "bucket"])
        .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity_expr(
                F.col("query_id_vec"), F.col("neighbor_id_vec")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))
    )
