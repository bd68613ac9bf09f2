from traject_spark.marc.schema import MARC_RECORD_TYPE, MARC_SOURCE_SCHEMA, marc_record
from traject_spark.marc.spec import MarcSpec, parse_marc_spec
from traject_spark.marc.extractor import marc_extract

__all__ = [
    "MARC_RECORD_TYPE",
    "MARC_SOURCE_SCHEMA",
    "marc_record",
    "MarcSpec",
    "parse_marc_spec",
    "marc_extract",
]
