"""Physical-plan SHAPE regression tests — the 100 TB posture, pinned
structurally instead of living only in docstrings and soak numbers
(VERDICT r8 item 6).

Three invariants a refactor must not silently break:

1. The FLAGSHIP mapping pipeline (the exact one ``entry()`` exposes and
   B1 times) is one narrow stage: zero ``Exchange`` operators. On a
   1000-executor cluster an accidental shuffle in the per-record map
   path turns an embarrassingly-parallel scan into the job bottleneck.
2. ``ivf_topk_from_layout`` keeps dynamic partition pruning on the
   ``cell`` column — file-level pruning is the whole point of the
   partitioned layout; losing it re-reads the full corpus per probe.
3. The shared LSH banding projection (``_banded``) scans the corpus
   ONCE per join side, regardless of how many hash tables it posexplodes
   — ``tables`` must multiply rows AFTER one scan, never re-scan the
   parquet per table.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pipeline_zero_exchange(spark):
    """The B1 / entry() pipeline compiles to a single narrow select over
    the parquet scan: no Exchange anywhere in the physical plan."""
    from __spark_entry__ import _marc, flagship_pipeline

    plan = _plan(flagship_pipeline().apply(_marc(spark, SF_DIR)))
    assert "Exchange" not in plan, plan[:2000]


def test_ivf_layout_plan_keeps_dynamic_pruning(spark, tmp_path):
    """The partitioned-IVF probe join must carry a dynamicpruning
    subquery on cell — structural twin of the behavioral test in
    test_similarity.py, kept here so plan guards live in one module."""
    from traject_spark.corpus import (
        ivf_topk_from_layout,
        train_centroids,
        write_ivf_layout,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") >= 8)
    cents = train_centroids(corpus, n_centroids=4, sample=200)
    path = str(tmp_path / "ivf")
    write_ivf_layout(corpus, cents, path)
    out = ivf_topk_from_layout(
        spark, path, emb.filter(F.col("vec_id") < 8), cents, k=5, nprobe=2
    )
    assert "dynamicpruning" in _plan(out).lower()


def _scan_count(plan: str, token: str = "Scan parquet") -> int:
    return plan.count(token)


def test_banded_pair_plan_scans_corpus_once_per_side(spark):
    """cosine_near_dup(mode='lsh') reads the embeddings parquet exactly
    twice (side a + side b): the ``tables`` fan-out is a posexplode over
    one scan's output, not a per-table re-scan. 4 tables -> still 2
    scans; at 100 TB the difference is 2 corpus reads vs 8."""
    from traject_spark.corpus import cosine_near_dup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = cosine_near_dup(
        emb, threshold=0.35, mode="lsh", bits=4, tables=4
    )
    n = _scan_count(_plan(out))
    assert n == 2, f"expected 2 parquet scans (one per side), got {n}"


def test_banded_witness_plan_scan_count(spark):
    """cosine_near_dup_witness's parquet scan count is INDEPENDENT of
    ``tables`` (banding + candidate derivations + two id-keyed vector
    fetches — a small constant): a regression that re-scans per table
    would grow the count with t."""
    from traject_spark.corpus import cosine_near_dup_witness

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    counts = {
        t: _scan_count(
            _plan(cosine_near_dup_witness(emb, threshold=0.9, bits=4,
                                           tables=t))
        )
        for t in (2, 8)
    }
    assert counts[2] == counts[8] <= 5, counts


def test_minhash_banding_scans_documents_once_per_side(spark):
    """minhash_lsh_candidates: signature computation + band explode run
    over ONE scan per join side (band_hash fan-out is an explode, not a
    union of per-band scans)."""
    from traject_spark.corpus import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = minhash_lsh_candidates(docs, num_hashes=16, bands=4)
    n = _scan_count(_plan(out))
    assert n <= 2, f"expected <=2 parquet scans, got {n}"


def test_pruning_and_pushdown_reach_the_scan(spark):
    """Declarative plans keep Catalyst's free wins: a 2-column
    projection with a filter over lineitem must show the predicate in
    PushedFilters and a ReadSchema WITHOUT the unused wide columns —
    a scan that reads l_comment for a quantity sum is reading ~30% of
    100 TB for nothing."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty")
    )
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan, plan[plan.find("PushedFilters"):][:300]
    rs = plan[plan.find("ReadSchema:"):].splitlines()[0]
    assert "l_quantity" in rs and "l_returnflag" in rs
    assert "l_comment" not in rs and "l_extendedprice" not in rs, rs


def test_flagship_compile_build_cost_regression(spark):
    """Driver-side expression BUILD rivals execution for the flagship;
    a build regression — someone un-SQLing a generated-SQL fast path —
    is invisible in end-to-end wall time until it eats the B1 gate.
    Floor after the r11 formats/geo generated-SQL paths: ~1.0s warm /
    ~1.9s cold on this box; min-of-3 must stay under ~2x the cold
    floor (the min absorbs this box's documented multi-second host
    stalls)."""
    import time

    from __spark_entry__ import flagship_pipeline

    # VERDICT r11 #2: the stamp reads ~1.1s at sf0.1; a bound of 4.0
    # would let a 3x driver-side regression ship green. One settle-and-
    # retry (r13): a full-suite run on a degraded window pushed min-of-3
    # past the bound once (whole suite 1.6x slow) — a REAL regression
    # fails both attempts, box noise doesn't abort the driver's -x run.
    attempts = []
    for attempt in range(2):
        builds = []
        for _ in range(3):
            t0 = time.monotonic()
            fields, _skip = flagship_pipeline().compile()
            builds.append(time.monotonic() - t0)
        assert fields
        attempts.append(builds)
        if min(builds) < 2.0:
            break
        time.sleep(5)
    assert min(min(b) for b in attempts) < 2.0, attempts


def test_marc8_ingest_plan_is_narrow(spark, tmp_path):
    """The MARC-8 binary ingest (bench lane ingest_iso2709_marc8) must
    stay one narrow stage: binaryFile scan -> Arrow-batched parse, zero
    Exchange — on a cluster the decode parallelism is exactly the file
    split parallelism, nothing to shuffle."""
    from traject_spark.marc.io import read_iso2709
    from traject_spark.marc.serialize import to_iso2709

    rec = {
        "leader": "00000cam a2200000 a 4500",
        "controlfields": [{"tag": "001", "value": "p1"}],
        "datafields": [
            {"tag": "245", "ind1": "1", "ind2": "0",
             "subfields": [{"code": "a", "value": "Мир"}]},
        ],
    }
    p = tmp_path / "r.mrc"
    p.write_bytes(to_iso2709(rec, encoding="MARC-8") * 4)
    df = read_iso2709(spark, str(p), encoding="MARC-8")
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert df.count() == 4
