"""Property tests for the witness near-dup recall claim.

The shadowing argument in traject_spark/corpus/dedup.py
(minhash_near_dup_witness docstring) is prose: every member of an
exact clique except its GLOBAL minimum id must be marked, because all
of its band buckets contain smaller clique members (identical texts
have identical signatures, hence identical band hashes). These tests
pin that claim over randomized planted cliques + noise, and extend it
through the transitive closure: with vocab-disjoint cliques, every
member's cluster_id is its clique minimum.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _clique_text(ci: int, n_tokens: int) -> str:
    # per-clique disjoint vocabulary: cross-clique jaccard is exactly 0,
    # so witness edges cannot leave a clique and the expected clusters
    # are SQL-predictable
    return " ".join(f"w{ci}x{j} q{ci}y{j}" for j in range(n_tokens))


@st.composite
def planted_corpus(draw):
    n_cliques = draw(st.integers(1, 3))
    ids = draw(
        st.lists(
            st.integers(0, 9999),
            min_size=n_cliques * 2 + 2,
            max_size=n_cliques * 6 + 6,
            unique=True,
        )
    )
    rows, cliques, pos = [], [], 0
    for ci in range(n_cliques):
        size = draw(st.integers(2, 5))
        size = min(size, len(ids) - pos - 2)  # keep >=2 ids for noise
        if size < 2:  # ids exhausted: a clique needs >= 2 members
            break
        members = sorted(ids[pos : pos + size])
        pos += size
        text = _clique_text(ci, draw(st.integers(8, 14)))
        rows += [(i, text) for i in members]
        cliques.append(members)
    for j, i in enumerate(ids[pos:]):
        rows.append((i, _clique_text(100 + j, 10)))  # singleton noise
    return rows, cliques


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=planted_corpus())
def test_witness_marks_every_nonmin_clique_member(spark, corpus):
    from traject_spark.corpus import (
        minhash_near_dup_clusters,
        minhash_near_dup_witness,
    )

    rows, cliques = corpus
    df = spark.createDataFrame(rows, "doc_id long, text string")
    marked = {
        r["id"]: r
        for r in minhash_near_dup_witness(
            df, num_hashes=32, bands=8, min_est=0.9
        ).collect()
    }
    for members in cliques:
        lo = members[0]
        for m in members[1:]:
            assert m in marked, (m, members, sorted(marked))
            assert marked[m]["witness_id"] < m
            # exact copies agree on every hash against their witness
            assert marked[m]["est_jaccard"] == 1.0
    # vocab-disjoint noise singletons are never marked
    clique_ids = {m for ms in cliques for m in ms}
    assert set(marked) <= clique_ids

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_near_dup_clusters(
            df, num_hashes=32, bands=8, min_est=0.9
        ).collect()
    }
    assert len(labels) == len(rows)
    for members in cliques:
        for m in members:
            assert labels[m] == members[0], (m, members, labels)
    for i, _ in rows:
        if i not in clique_ids:
            assert labels[i] == i
