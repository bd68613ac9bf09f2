"""traject_spark — a PySpark-native rebuild of the traject ETL engine.

The reference (traject/traject, Ruby) maps streams of MARC / XML records
through an ordered pipeline of field-extraction + transformation steps into
multi-valued output documents, then writes them to Solr or files.

This package re-expresses that model Spark-first:

- a source record is one DataFrame row with a static nested MARC struct
  (see ``traject_spark.marc.schema``),
- a ``to_field`` rule compiles to a single Column expression built from
  higher-order array functions (``transform``/``filter``/``flatten``) —
  entirely intra-row, so the whole pipeline is ONE narrow ``select`` with
  no shuffle: it scales linearly to arbitrary cluster/data size,
- macros (``extract_marc``, ``trim_punctuation``, translation maps, the
  MARC21 semantic derivations) are Column-expression builders composed per
  rule, mirroring reference semantics cited per-function as file:line.

Reference parity citations point into /root/reference (traject v3.8.x).
"""

from traject_spark.pipeline import Pipeline
from traject_spark.macros.basic import literal
from traject_spark.macros.marc21 import (
    extract_marc,
    extract_all_marc_values,
    serialized_marc,
)
from traject_spark import transforms
from traject_spark.translation_map import TranslationMap

__version__ = "0.5.0"

__all__ = [
    "Pipeline",
    "literal",
    "extract_marc",
    "extract_all_marc_values",
    "serialized_marc",
    "transforms",
    "TranslationMap",
]
