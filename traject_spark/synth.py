"""Deterministic MARC synthesis from the driver's synthetic tables.

The correctness gate runs each Spark query against a DuckDB oracle over the
SAME parquet inputs, so the MARC records the engine is exercised on must be
derivable both ways: here every field is a pure expression of ``documents``
columns, written twice — once as Spark Columns (`marc_from_documents`) and
once as DuckDB SQL fragments (the ``SQL_*`` constants) that oracle queries
compose. Keep the two in lockstep.

Layout of a synthesized record for doc row (doc_id, text, lang, source,
n_chars):

- leader: genre byte pair cycles am/gm/em/at by doc_id%4
- 001   : doc_id
- 008   : '880520s' + year(=1980+doc_id%45) + '    xxu' + 17 spaces + lang3
- 035a  : OCLC-prefixed for doc_id%3 in (0,1), non-OCLC otherwise
- 041a  : packed 'engfre' every 10th doc, else lang3
- 048   : $a instrument code cycles ba01/bb01/ca07/bd01 by doc_id%4,
          plus $b 'bd01' (soloist) every 3rd doc
- 050a  : LCC-ish call number, letter cycles by doc_id%26
- 100a  : author name, letter cycles
- 245   : ind2=4 + 'The ' prefix every 5th doc (non-filing test), $a/$b/$c
- 260   : $b publisher, $c 'c'+year+'.'
- 490   : ind1 '1'/'0' alternating (series-traced test)
- 650   : $a topic + $x 'History' + $y era ('(18+id%3)th century.') + $z
          geo subdivision (LCSH/geo/era tests)
- 880   : alternate-script pair for 245 every 4th doc
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traject_spark.marc.schema import MARC_SOURCE_SCHEMA

# language code mapping used for the 008/041 fields (documents.lang values)
LANG3 = {"en": "eng", "de": "ger", "fr": "fre", "es": "spa", "zh": "chi"}
#: subset of the marc_languages translation map the synthesized codes hit
LANG_NAME = {"eng": "English", "ger": "German", "fre": "French",
             "spa": "Spanish", "chi": "Chinese", "mul": "Multiple languages"}

GENRES = ["am", "gm", "em", "at"]  # leader bytes 6-7 by doc_id%4


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def _sf(code, value: Column):
    return F.struct(F.lit(code).alias("code"), value.alias("value"))


def _df_struct(tag: str, ind1: Column, ind2: Column, subfields: list) -> Column:
    return F.struct(
        F.lit(tag).alias("tag"),
        (ind1 if isinstance(ind1, Column) else F.lit(ind1)).alias("ind1"),
        (ind2 if isinstance(ind2, Column) else F.lit(ind2)).alias("ind2"),
        F.array(*subfields).alias("subfields"),
    )


def marc_from_documents(df: DataFrame, keep: tuple = ()) -> DataFrame:
    """documents table -> (record_id string, marc struct [, *keep]) DataFrame.

    Pure narrow projection — no UDF, no shuffle; scales linearly with input
    partitions, which is what makes the mapping benchmark meaningful.
    ``keep`` carries extra source columns through (e.g. for skip predicates).
    """
    doc_id = F.col("doc_id")
    text = F.col("text")
    title = F.array_join(F.slice(F.split(text, " "), 1, 8), " ")
    year = (F.lit(1980) + doc_id % 45).cast("string")
    lang3 = _lang3_col(F.col("lang"))
    mod3 = doc_id % 3
    mod4 = (doc_id % 4).cast("int")
    mod5 = doc_id % 5

    leader = F.concat(
        F.lit("01234c"),
        F.element_at(F.array(*[F.lit(g) for g in GENRES]), mod4 + 1),
        F.lit(" a2200301 a 4500"),
    )
    f008 = F.concat(
        F.lit("880520s"), year, F.lit("    xxu"), F.lit(" " * 17), lang3
    )
    controlfields = F.array(
        F.struct(F.lit("001").alias("tag"), doc_id.cast("string").alias("value")),
        F.struct(F.lit("008").alias("tag"), f008.alias("value")),
    )

    oclc = (
        F.when(mod3 == 0, F.concat(F.lit("(OCoLC)"), (doc_id + 1000000).cast("string")))
        .when(mod3 == 1, F.concat(F.lit("ocm"), F.lpad(doc_id.cast("string"), 8, "0")))
        .otherwise(F.concat(F.lit("ABC"), doc_id.cast("string")))
    )
    packed041 = F.when(doc_id % 10 == 0, F.lit("engfre")).otherwise(lang3)
    letter = F.char(F.lit(65) + (doc_id % 26).cast("int"))
    lcc = F.concat(letter, (doc_id % 900 + 1).cast("string"), F.lit(".5 .A"),
                   (doc_id % 9 + 1).cast("string"))
    author = F.concat(F.lit("Author, "), letter, F.lit("."))
    t_ind2 = F.when(mod5 == 0, F.lit("4")).otherwise(F.lit("0"))
    t_a = F.when(mod5 == 0, F.concat(F.lit("The "), title, F.lit(" :"))).otherwise(
        F.concat(title, F.lit(" :"))
    )
    t_b = F.concat(F.lit("a "), F.col("source"), F.lit(" study /"))
    t_c = F.concat(F.lit("by Author "), letter, F.lit("."))
    topic = F.concat(F.lit("Topic "), (doc_id % 10).cast("string"))
    geo = F.concat(F.lit("Region "), (doc_id % 5).cast("string"), F.lit("."))
    series_ind1 = F.when(doc_id % 2 == 0, F.lit("1")).otherwise(F.lit("0"))
    series_a = F.concat(F.lit("Series "), (doc_id % 20).cast("string"), F.lit(" ;"))
    era = F.concat(
        (F.lit(18) + doc_id % 3).cast("string"), F.lit("th century.")
    )
    instr_a = F.element_at(
        F.array(F.lit("ba01"), F.lit("bb01"), F.lit("ca07"), F.lit("bd01")),
        mod4 + 1,
    )
    instr_sfs = F.when(
        doc_id % 3 == 0,
        F.array(_sf("a", instr_a), _sf("b", F.lit("bd01"))),
    ).otherwise(F.array(_sf("a", instr_a)))

    base_datafields = [
        _df_struct("035", " ", " ", [_sf("a", oclc)]),
        _df_struct("041", "0", " ", [_sf("a", packed041)]),
        F.struct(
            F.lit("048").alias("tag"),
            F.lit(" ").alias("ind1"),
            F.lit(" ").alias("ind2"),
            instr_sfs.alias("subfields"),
        ),
        _df_struct("050", "0", "0", [_sf("a", lcc)]),
        _df_struct("100", "1", " ", [_sf("a", author)]),
        _df_struct("245", "1", t_ind2, [_sf("a", t_a), _sf("b", t_b), _sf("c", t_c)]),
        _df_struct("260", " ", " ", [
            _sf("b", F.concat(F.col("source"), F.lit(" Press,"))),
            _sf("c", F.concat(F.lit("c"), year, F.lit("."))),
        ]),
        _df_struct("490", series_ind1, " ", [_sf("a", series_a)]),
        _df_struct("650", " ", "0", [_sf("a", topic), _sf("x", F.lit("History")),
                                     _sf("y", era), _sf("z", geo)]),
    ]
    alt880 = _df_struct(
        "880", "1", t_ind2,
        [_sf("6", F.lit("245-01")), _sf("a", F.concat(F.lit("Alt "), title))],
    )
    datafields = F.when(
        mod4 == 0, F.array(*base_datafields, alt880)
    ).otherwise(F.array(*base_datafields))

    marc = F.struct(
        leader.alias("leader"),
        controlfields.alias("controlfields"),
        datafields.alias("datafields"),
    )
    return df.select(
        doc_id.cast("string").alias("record_id"),
        # align nullability etc. with the canonical source schema
        marc.cast(MARC_SOURCE_SCHEMA["marc"].dataType).alias("marc"),
        *[F.col(c) for c in keep],
    )


def _lang3_col(lang: Column) -> Column:
    m = None
    for k, v in LANG3.items():
        m = F.when(lang == k, F.lit(v)) if m is None else m.when(lang == k, F.lit(v))
    return m.otherwise(F.lit("und"))


def xml_from_documents(df: DataFrame) -> DataFrame:
    """documents table -> (record_id string, xml string) DataFrame.

    Per-record oai_dc-ish XML derived purely from ``documents`` columns so
    the DuckDB oracle can re-derive the extracted values (SQL_XML_* below).
    Exercises what extract_xpath must handle: namespace prefixes, an
    attribute, repeated elements (2nd creator every 3rd doc), and
    whitespace needing normalization.
    """
    doc_id = F.col("doc_id")
    title = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    # XML-escape the one piece of raw document text interpolated into
    # markup: an '&' or '<' in the vocabulary would make the record
    # ill-formed and silently drop it at parse time. The parser
    # unescapes on extraction, so the SQL twins still see the raw text.
    title = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(title, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;",
    )
    letter = F.char(F.lit(65) + (doc_id % 26).cast("int"))
    creator = F.concat(F.lit("Author, "), letter, F.lit("."))
    second = F.when(
        doc_id % 3 == 0,
        F.concat(F.lit("<dc:creator>Co-Author, "), letter, F.lit(".</dc:creator>")),
    ).otherwise(F.lit(""))
    year = (F.lit(1980) + doc_id % 45).cast("string")
    # mixed-content element: a <name> with nested <first>/<last> children
    # (and whitespace-only text between them) so extract_xpath's
    # join_text semantics — ONE joined value per match — are exercised
    # against a fast-path extraction of the same element
    surname = F.concat(F.lit("Surname"), (doc_id % 7).cast("string"))
    xml = F.concat(
        F.lit('<record id="rec-'), doc_id.cast("string"),
        F.lit('" xmlns:dc="http://purl.org/dc/elements/1.1/">'),
        F.lit("<dc:title>\n  "), title, F.lit("  \n</dc:title>"),
        F.lit("<dc:creator>"), creator, F.lit("</dc:creator>"), second,
        F.lit("<dc:date>"), year, F.lit("</dc:date>"),
        F.lit("<name>\n  <first>"), letter, F.lit(".</first>\n  <last>"),
        surname, F.lit("</last>\n</name>"),
        F.lit("</record>"),
    )
    return df.select(doc_id.cast("string").alias("record_id"), xml.alias("xml"))


# ---------------------------------------------------------------------------
# DuckDB side — SQL fragments mirroring the Spark expressions above.
# All operate on a `documents` relation with the same columns.
# ---------------------------------------------------------------------------

SQL_TITLE = "array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')"
SQL_YEAR = "CAST(1980 + doc_id % 45 AS VARCHAR)"
SQL_LANG3 = ("CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'ger' "
             "WHEN 'fr' THEN 'fre' WHEN 'es' THEN 'spa' WHEN 'zh' THEN 'chi' "
             "ELSE 'und' END")
SQL_LETTER = "chr(65 + CAST(doc_id % 26 AS INT))"
SQL_TITLE_A = (f"CASE WHEN doc_id % 5 = 0 THEN 'The ' || {SQL_TITLE} || ' :' "
               f"ELSE {SQL_TITLE} || ' :' END")
SQL_TITLE_B = "'a ' || source || ' study /'"
SQL_OCLC = (
    "CASE WHEN doc_id % 3 = 0 THEN '(OCoLC)' || CAST(doc_id + 1000000 AS VARCHAR) "
    "WHEN doc_id % 3 = 1 THEN 'ocm' || lpad(CAST(doc_id AS VARCHAR), 8, '0') "
    "ELSE 'ABC' || CAST(doc_id AS VARCHAR) END"
)
SQL_GENRE = ("CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'am' WHEN 1 THEN 'gm' "
             "WHEN 2 THEN 'em' ELSE 'at' END")
SQL_ERA = "CAST(18 + doc_id % 3 AS VARCHAR) || 'th century.'"
SQL_INSTR_A = ("CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'ba01' "
               "WHEN 1 THEN 'bb01' WHEN 2 THEN 'ca07' ELSE 'bd01' END")

# xml_from_documents twins: extracted (whitespace-normalized) values
SQL_XML_CREATORS = (
    f"CASE WHEN doc_id % 3 = 0 "
    f"THEN 'Author, ' || {SQL_LETTER} || '.|Co-Author, ' || {SQL_LETTER} || '.' "
    f"ELSE 'Author, ' || {SQL_LETTER} || '.' END"
)
# //name fast path: one value per non-blank text node ('A.', 'Surname3')
SQL_XML_NAME_PARTS = (
    f"{SQL_LETTER} || '.|Surname' || CAST(doc_id % 7 AS VARCHAR)"
)
# //name join_text: the reference's per-match join — the raw text nodes
# inside <name> are '\n  ', 'A.', '\n  ', 'Surname3', '\n'; all-blank ones
# are rejected and the rest joined with ' ' into ONE value
SQL_XML_NAME_JOINED = (
    f"{SQL_LETTER} || '. Surname' || CAST(doc_id % 7 AS VARCHAR)"
)
