"""Relational-scale helpers: explicit skew handling and join co-location.

With AQE on (the engine's default session shape), skewed sort-merge
joins are split automatically at runtime — prefer that. This module
covers the cases AQE cannot: streaming joins (AQE is disabled in
stateful workloads), engines/plans where a deterministic static plan is
required, and the shuffle itself — a repeatedly-joined 100 TB table
should be bucketed ONCE at write time so every subsequent join on the
bucket key runs shuffle-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``keys``.

    THE amortized-shuffle layout for 100 TB fact tables: pay one shuffle
    at write time; every later equi-join or aggregation on ``keys``
    between tables bucketed with the SAME key/bucket-count reads
    co-located buckets and runs with NO Exchange in the plan (verify
    with ``bucketed_join(...).explain``). Bucketing metadata lives in
    the catalog, so this writes a table, not a bare path.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *keys
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketing tables on their bucket keys — shuffle-free
    when both were written by ``write_bucketed`` with identical keys and
    bucket counts (sort-merge join over co-located, pre-sorted buckets).
    """
    return spark.table(left_table).join(
        spark.table(right_table), list(on), how
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resilient equi-join: the (large, skewed) ``left`` side gets a
    deterministic per-row salt in [0, salt); the ``right`` side is
    replicated across all salt values; the join key becomes
    (on..., _salt), so one hot key's rows spread over ``salt`` reducers
    instead of one straggler task.

    Cost model: right-side shuffle volume multiplies by ``salt`` — use
    for large-x-medium joins where the left is skewed and the right is
    too big to broadcast but cheap to replicate. The salt hashes the
    left row's columns PLUS a per-row disambiguator
    (monotonically_increasing_id), so even byte-identical hot-key rows —
    the classic degenerate-skew shape — spread across reducers instead
    of re-piling onto one. The disambiguator may differ across task
    retries; that only moves a row to a different salt bucket, and every
    bucket has a full replicated right side, so the join result is
    unchanged.
    """
    on = list(on)
    if not on:
        raise ValueError("salted_join needs at least one join key")
    # The right side is replicated across all `salt` values, so any join
    # flavor that emits unmatched RIGHT rows (right/full outer) would
    # emit each of them `salt` times plus null-extended phantoms — only
    # left-preserving flavors are correct under replication.
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right-side replication would duplicate unmatched right rows"
        )
    if "_salt" in left.columns or "_salt" in right.columns:
        # withColumn would silently overwrite the user's column, feed the
        # synthetic value to the join, then drop the column entirely
        raise ValueError(
            "salted_join reserves the column name '_salt'; rename it on "
            "the input first"
        )
    if salt < 2:
        return left.join(right, on, how)
    lsalt = F.pmod(
        F.xxhash64(
            F.monotonically_increasing_id(), *[F.col(c) for c in left.columns]
        ),
        F.lit(salt),
    )
    salted_left = left.withColumn("_salt", lsalt)
    salted_right = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>")),
    )
    return salted_left.join(salted_right, on + ["_salt"], how).drop("_salt")
