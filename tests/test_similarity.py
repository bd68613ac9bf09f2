"""IVF / near-dup similarity operators (sf0.001 embeddings, 64-dim)."""

import pytest
from pyspark.sql import functions as F

from traject_spark.corpus import (
    brute_force_topk,
    cosine_near_dup,
    ivf_topk,
    train_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_train_centroids_deterministic(emb):
    c1 = train_centroids(emb, n_centroids=8, iters=5)
    c2 = train_centroids(emb, n_centroids=8, iters=5)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0][1]) == 64


def test_ivf_topk_recall(emb):
    corpus = emb.filter(F.col("vec_id") >= 8)
    queries = emb.filter(F.col("vec_id") < 8)
    cents = train_centroids(corpus, n_centroids=8, iters=5)
    exact = brute_force_topk(corpus, queries, k=5)
    approx = ivf_topk(corpus, queries, cents, k=5, nprobe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # every approx hit must be a real corpus vector scored exactly;
    # recall against brute force should beat random cell luck (3/8)
    recall = len(e & a) / len(e)
    assert recall >= 0.3
    # deterministic across runs
    a2 = {(r["query_id"], r["neighbor_id"]) for r in
          ivf_topk(corpus, queries, cents, k=5, nprobe=3).collect()}
    assert a == a2


def test_ivf_full_probe_equals_brute_force(emb):
    """Probing every cell must recover the exact result."""
    corpus = emb.filter(F.col("vec_id") >= 8)
    queries = emb.filter(F.col("vec_id") < 8).limit(4)
    cents = train_centroids(corpus, n_centroids=4, iters=3)
    exact = brute_force_topk(corpus, queries, k=5)
    full = ivf_topk(corpus, queries, cents, k=5, nprobe=4)
    e = sorted(tuple(r) for r in exact.collect())
    f = sorted(tuple(r) for r in full.collect())
    assert e == f


def test_near_dup_exact_nonempty_and_symmetric_free(emb):
    pairs = cosine_near_dup(emb, threshold=0.35).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["score"] >= 0.35


def test_near_dup_lsh_subset_of_exact(emb):
    exact = {(r["id_a"], r["id_b"]) for r in
             cosine_near_dup(emb, threshold=0.3).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           cosine_near_dup(emb, threshold=0.3, mode="lsh",
                           bits=4, tables=8).collect()}
    assert lsh <= exact
    assert len(lsh) > 0
