"""Benchmark decontamination: exact n-gram collision marking/removal."""

import pytest
from pyspark.sql import functions as F

from traject_spark.corpus import contamination_mark, decontaminate


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1: verbatim 20-token overlap with bench item b1 (>= one 13-gram)
    # doc 2: clean text, no shared 13-gram
    # doc 3: shares exactly 12 consecutive tokens with b2 -> NOT contaminated
    #        at n=13 (the window never fits inside the shared run)
    # doc 4: NULL text -> never contaminated
    # doc 5: short doc identical to short bench item b3 (whole-text shingle)
    # doc 6: short doc differing from b3 by one token -> clean
    shared20 = _words("s", 20)
    shared12 = _words("t", 12)
    rows = [
        (1, f"{_words('a', 5)} {shared20} {_words('b', 5)}"),
        (2, _words("c", 40)),
        (3, f"{_words('d', 10)} {shared12} {_words('e', 10)}"),
        (4, None),
        (5, "tiny shared benchmark text"),
        (6, "tiny shared different text"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    shared20 = _words("s", 20)
    shared12 = _words("t", 12)
    rows = [
        (f"{_words('x', 3)} {shared20} {_words('y', 3)}",),
        (f"{shared12} {_words('z', 15)}",),
        ("tiny shared benchmark text",),
    ]
    return spark.createDataFrame(rows, "text string")


@pytest.mark.parametrize("hash_shingles", [True, False])
def test_contamination_mark(spark, corpus, bench_set, hash_shingles):
    marks = {
        r["doc_id"]: r["n_matched_ngrams"]
        for r in contamination_mark(
            corpus, bench_set, n=13, hash_shingles=hash_shingles
        ).collect()
    }
    # doc 1: 20-token shared run contains 20-13+1 = 8 distinct 13-grams
    assert marks[1] == 8
    # doc 5: whole-text shingle matches the short bench item exactly
    assert marks[5] == 1
    # docs 2 (clean), 3 (12 < n shared run), 4 (NULL), 6 (off-by-one) clean
    assert set(marks) == {1, 5}


def test_min_matches_threshold(spark, corpus, bench_set):
    marks = {
        r["doc_id"]
        for r in contamination_mark(
            corpus, bench_set, n=13, min_matches=2
        ).collect()
    }
    # doc 5 has exactly one matched n-gram -> filtered by min_matches=2
    assert marks == {1}


def test_decontaminate_keeps_null_text(spark, corpus, bench_set):
    kept = {
        r["doc_id"] for r in decontaminate(corpus, bench_set, n=13).collect()
    }
    assert kept == {2, 3, 4, 6}


def test_broadcast_plan_shape(spark, corpus, bench_set):
    """Default posture: the benchmark side broadcasts — the corpus-side
    explode joins without a shuffle on the corpus grams."""
    marks = contamination_mark(corpus, bench_set, n=13)
    plan = marks._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # explicit opt-out falls back to a non-broadcast join
    no_bc = contamination_mark(
        corpus, bench_set, n=13, broadcast_bench=False
    )
    # AQE may still choose broadcast at runtime; assert only that the
    # static hint is gone from the optimized logical plan
    logical = no_bc._jdf.queryExecution().optimizedPlan().toString()
    assert "UNBROADCASTABLE" not in logical  # smoke: plan builds


def test_validation(spark, corpus, bench_set):
    with pytest.raises(ValueError, match="n must be"):
        contamination_mark(corpus, bench_set, n=0)
    with pytest.raises(ValueError, match="min_matches"):
        contamination_mark(corpus, bench_set, min_matches=0)


def test_duckdb_twin(spark, corpus, bench_set, tmp_path):
    """Exact-string mode agrees with a DuckDB oracle of the same rule."""
    duckdb = pytest.importorskip("duckdb")
    corpus.write.mode("overwrite").parquet(str(tmp_path / "c.parquet"))
    bench_set.write.mode("overwrite").parquet(str(tmp_path / "b.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW c AS SELECT * FROM '{tmp_path}/c.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW b AS SELECT * FROM '{tmp_path}/b.parquet/*.parquet'"
    )
    oracle = dict(
        con.execute(
            """
        WITH cg AS (
          SELECT doc_id, unnest(list_distinct(CASE
            WHEN len(string_split(text,' ')) >= 13 THEN
              list_transform(range(1, len(string_split(text,' ')) - 11),
                i -> array_to_string(string_split(text,' ')[i:i+12], ' '))
            ELSE [text] END)) AS gram
          FROM c WHERE text IS NOT NULL
        ), bg AS (
          SELECT DISTINCT unnest(list_distinct(CASE
            WHEN len(string_split(text,' ')) >= 13 THEN
              list_transform(range(1, len(string_split(text,' ')) - 11),
                i -> array_to_string(string_split(text,' ')[i:i+12], ' '))
            ELSE [text] END)) AS gram
          FROM b
        )
        SELECT doc_id, count(*) FROM cg JOIN bg USING (gram)
        GROUP BY doc_id
        """
        ).fetchall()
    )
    spark_marks = {
        r["doc_id"]: r["n_matched_ngrams"]
        for r in contamination_mark(
            corpus, bench_set, n=13, hash_shingles=False
        ).collect()
    }
    assert spark_marks == oracle
