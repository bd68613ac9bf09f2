"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and compare against its
``oracle_sql()`` DuckDB twin (sorted rows, NaN-safe float compare).

Defaults to sf0.001 for suite speed; run at the driver's actual scale
with ``ORACLE_SF_DIR=/root/testdata/sf0.01 pytest tests/test_entry_oracle.py``.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return str(round(v, 9))
    return str(v)


def _rows(df_rows, cols):
    return sorted(
        tuple(_norm(r[c]) for c in sorted(cols)) for r in df_rows
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]

    con = _duck()
    ddf = con.execute(ORACLES[name]).df()
    dcols = list(ddf.columns)
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    drows = ddf.to_dict("records")

    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sn, dn = _rows(srows, scols), _rows(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


_ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_every_window_query_has_an_oracle():
    """The strongest registry shape: EVERY queries() entry carries a
    DuckDB oracle (the driver's weaker rows-only check never applies).
    If a genuinely non-SQL-expressible op ever registers, the
    rows-only smoke below starts covering it."""
    assert _ROWS_ONLY == []


if _ROWS_ONLY:  # no perpetual empty-parametrize skip when the set is empty
    @pytest.mark.parametrize("name", _ROWS_ONLY)
    def test_rows_only_queries_run(spark, name):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0
        assert df.schema is not None


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_registry_fits_driver_window():
    """The driver evaluates only the FIRST 50 registered queries: every
    registered query must sit inside that window, and every oracle must
    correspond to a registered query (no dead oracle entries)."""
    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} queries registered; driver only checks 50"
    )
    assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))


ROTATED = entry_mod.rotated_out()


@pytest.mark.parametrize("name", sorted(ROTATED))
def test_rotated_out_matches_oracle(spark, name):
    """Rotation policy guard (docs/extending.md): a query rotated out of
    the 50-row driver window keeps its FULL hash-grade oracle compare
    here — rotation reallocates driver slots, it never drops signal."""
    fn, sql = ROTATED[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    ddf = _duck().execute(sql).df()
    assert sorted(scols) == sorted(ddf.columns), f"{name}: column mismatch"
    drows = ddf.to_dict("records")
    assert len(srows) == len(drows)
    sn, dn = _rows(srows, scols), _rows(drows, list(ddf.columns))
    assert sn == dn, f"{name}: mismatch {[p for p in zip(sn, dn) if p[0] != p[1]][:3]}"


def test_rotated_out_disjoint_from_window():
    """A name is either in the driver window or rotated out, never both;
    and rotation is append-only coverage (the callable still exists)."""
    assert not set(ROTATED) & set(QUERIES), set(ROTATED) & set(QUERIES)
    for name, (fn, sql) in ROTATED.items():
        assert callable(fn) and "SELECT" in sql.upper(), name


def test_rotation_ledger_complete_and_in_window():
    """Mechanized rotation ledger (VERDICT r14 #7): ROTATIONS covers
    rotated_out() exactly, and every named subsumer AND slot recipient
    is currently inside the 50-row driver window — so a future rotation
    cannot silently orphan coverage (rotating out a subsumer without
    updating the ledger fails here)."""
    ledger = entry_mod.ROTATIONS
    assert set(ledger) == set(ROTATED), (
        set(ledger) ^ set(ROTATED)
    )
    window = set(QUERIES)
    for name, row in ledger.items():
        assert row["subsumed_by"], name
        for sub in row["subsumed_by"]:
            assert sub in window, (
                f"{name}: subsumer {sub!r} is not in the driver window"
            )
        assert row["slot_to"] in window, (
            f"{name}: slot recipient {row['slot_to']!r} left the window"
        )
        assert isinstance(row["round"], int) and row["round"] >= 1
