"""PII detection/redaction: hand-computed semantics plus a hash-grade
Spark-vs-DuckDB parity compare over a crafted corpus running the
IDENTICAL pattern strings (the patterns are restricted to the
Java-regex/RE2 intersection precisely so this compare is meaningful).
A window-candidate for the driver oracle next rotation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from traject_spark.corpus import PII_PATTERNS, pii_redact_expr, pii_stats_expr

CASES = [
    (0, "contact me at jane.doe+spam@example.co.uk for details"),
    (1, "server at 192.168.1.200 port 8080, backup 10.0.0.7"),
    (2, "call +1 (415) 555-0199 or 020 7946 0958 today"),
    (3, "no pii in this perfectly ordinary sentence"),
    (4, "mixed: bob@site.org from 127.0.0.1 dialed 555-123-4567"),
    (5, "version 1.2.3.4 of the library"),  # ipv4-shaped: counted (documented)
    (6, "a+b@c.io x@y.z"),  # second has a 1-char TLD: NOT an email
    (7, ""),
    (8, None),
    (9, "edge 999.999.999.999 still ipv4-shaped by the public regex"),
]


def _spark_rows(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    out = df.select(
        "doc_id",
        pii_stats_expr(F.col("text")).alias("s"),
        pii_redact_expr(F.col("text")).alias("redacted"),
    ).select("doc_id", "s.*", "redacted")
    return sorted(
        (tuple(r) for r in out.collect()), key=lambda t: t[0]
    )


def test_pii_hand_computed(spark):
    rows = {t[0]: t for t in _spark_rows(spark)}
    # (doc_id, n_email, n_ipv4, n_phone, has_pii, redacted)
    assert rows[0][1:5] == (1, 0, 0, True)
    assert "[EMAIL]" in rows[0][5] and "jane" not in rows[0][5]
    # the dotted IP is ALSO phone-shaped on raw text (stats are
    # per-category detectors; the redactor's order resolves precedence,
    # so the redaction below still reads [IP], never [PHONE])
    assert rows[1][1:5] == (0, 2, 1, True)
    assert "[IP]" in rows[1][5] and "[PHONE]" not in rows[1][5]
    assert rows[2][3] == 2 and rows[2][5].count("[PHONE]") == 2
    assert rows[3][1:5] == (0, 0, 0, False) and rows[3][5] == CASES[3][1]
    # redaction order: the IP is [IP], not eaten by the phone pattern
    assert "[EMAIL]" in rows[4][5] and "[IP]" in rows[4][5] and "[PHONE]" in rows[4][5]
    assert rows[6][1] == 1  # x@y.z rejected (TLD < 2 chars)
    assert rows[8][1] is None and rows[8][5] is None


def test_pii_duckdb_parity(spark):
    """Same patterns, same order, both engines, full row compare."""
    got = _spark_rows(spark)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", CASES)
    e_pat, e_tok = PII_PATTERNS["email"]
    i_pat, i_tok = PII_PATTERNS["ipv4"]
    p_pat, p_tok = PII_PATTERNS["phone"]
    sql = f"""
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '{e_pat}')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(text, '{i_pat}')) AS BIGINT) AS n_ipv4,
          CAST(len(regexp_extract_all(text, '{p_pat}')) AS BIGINT) AS n_phone,
          (len(regexp_extract_all(text, '{e_pat}')) > 0
           OR len(regexp_extract_all(text, '{i_pat}')) > 0
           OR len(regexp_extract_all(text, '{p_pat}')) > 0) AS has_pii,
          regexp_replace(
            regexp_replace(
              regexp_replace(text, '{e_pat}', '{e_tok}', 'g'),
              '{i_pat}', '{i_tok}', 'g'),
            '{p_pat}', '{p_tok}', 'g') AS redacted
        FROM docs ORDER BY doc_id"""
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want
