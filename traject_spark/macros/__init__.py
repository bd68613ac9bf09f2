from traject_spark.macros.basic import literal
from traject_spark.macros.marc21 import (
    extract_marc,
    extract_all_marc_values,
    serialized_marc,
)

__all__ = ["literal", "extract_marc", "extract_all_marc_values", "serialized_marc"]
