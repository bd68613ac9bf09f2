"""Expression-level common-subexpression binding.

Spark Column objects are trees: writing ``f8 = F.substring(...)`` in Python
and referencing ``f8`` five times builds FIVE copies of the subtree. For
deeply composed expressions (e.g. the publication-date decision procedure)
this multiplies out to tens of thousands of Catalyst nodes — slow to build
over py4j, slow to optimize, and slow to codegen.

``let(value, body)`` binds ``value`` ONCE as a higher-order-function lambda
variable: the body references a leaf LambdaVariable instead of a copied
subtree, so tree size is additive, not multiplicative. At runtime the bound
value is evaluated exactly once per row (the 1-element array is a cheap
transient). Works for any data type, nests freely (inner lambdas may
reference outer variables), and stays inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once; pass the bound variable to ``body``.

    ``F.get(F.transform(F.array(value), body), 0)`` — the lambda variable
    inside ``body`` is a leaf node, eliminating subtree duplication.
    """
    return F.get(F.transform(F.array(value), body), 0)


def let2(v1: Column, v2: Column, body: Callable[[Column, Column], Column]) -> Column:
    return let(v1, lambda a: let(v2, lambda b: body(a, b)))


def let3(
    v1: Column, v2: Column, v3: Column,
    body: Callable[[Column, Column, Column], Column],
) -> Column:
    return let(v1, lambda a: let2(v2, v3, lambda b, c: body(a, b, c)))
