"""Basic macros (reference: lib/traject/macros/basic.rb)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def literal(value: str):
    """Append a constant value to the accumulator (basic.rb:3-8)."""

    def macro(acc: Column, ctx=None) -> Column:
        return F.concat(acc, F.array(F.lit(value)))

    return macro
