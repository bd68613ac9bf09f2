"""Static nested schema for MARC records (the marc-in-json shape).

Reference data model: a MARC record is a 24-byte leader + ordered fields;
control fields (tags 001-009) are tag+flat value, data fields are
tag+2 indicators+ordered repeatable subfields (code -> value).
(reference: lib/traject/marc_extractor.rb:283-287 distinguishes kinds;
lib/traject/ndj_reader.rb:29-35 reads exactly this JSON shape.)

Keeping control/data fields in separate typed arrays gives Catalyst a
closed-world schema: nested-schema pruning drops untouched subtrees at the
parquet scan, and every extraction compiles to intra-row array algebra.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

SUBFIELD_TYPE = StructType(
    [
        StructField("code", StringType(), True),
        StructField("value", StringType(), True),
    ]
)

CONTROLFIELD_TYPE = StructType(
    [
        StructField("tag", StringType(), True),
        StructField("value", StringType(), True),
    ]
)

DATAFIELD_TYPE = StructType(
    [
        StructField("tag", StringType(), True),
        StructField("ind1", StringType(), True),
        StructField("ind2", StringType(), True),
        StructField("subfields", ArrayType(SUBFIELD_TYPE, True), True),
    ]
)

MARC_RECORD_TYPE = StructType(
    [
        StructField("leader", StringType(), True),
        StructField("controlfields", ArrayType(CONTROLFIELD_TYPE, True), True),
        StructField("datafields", ArrayType(DATAFIELD_TYPE, True), True),
    ]
)

#: Schema for a source DataFrame of MARC records: one row per record.
MARC_SOURCE_SCHEMA = StructType(
    [
        StructField("record_id", StringType(), True),
        StructField("marc", MARC_RECORD_TYPE, True),
    ]
)


def marc_record(leader: str = " " * 24, controlfields=None, datafields=None) -> dict:
    """Build a python-dict MARC record matching MARC_RECORD_TYPE.

    ``controlfields``: list of (tag, value).
    ``datafields``: list of (tag, ind1, ind2, [(code, value), ...]).

    This is the test/`map_record` construction helper (the moral
    equivalent of the reference's MARC::Record fixture builders).
    """
    cfs = [{"tag": t, "value": v} for t, v in (controlfields or [])]
    dfs = [
        {
            "tag": t,
            "ind1": i1,
            "ind2": i2,
            "subfields": [{"code": c, "value": v} for c, v in sfs],
        }
        for t, i1, i2, sfs in (datafields or [])
    ]
    return {"leader": leader, "controlfields": cfs, "datafields": dfs}
