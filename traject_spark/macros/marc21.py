"""MARC21 extraction macros (reference: lib/traject/macros/marc21.rb)."""

from __future__ import annotations

import base64
from typing import Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from traject_spark.marc.extractor import _extract_sql, _ident_safe, marc_extract
from traject_spark.marc.spec import parse_marc_spec
from traject_spark.transforms import trim_punctuation_expr
from traject_spark.translation_map import TranslationMap

EXTRACT_MARC_VALID_OPTIONS = {
    "first",
    "trim_punctuation",
    "default",
    "allow_duplicates",
    "separator",
    "translation_map",
    "alternate_script",
}


def extract_marc(spec: str, _sql_fastpath: bool = True, **options):
    """The workhorse macro (marc21.rb:62-93).

    Options applied IN ORDER to the whole accumulator
    (apply_extraction_options, marc21.rb:115-140):
    first -> translation_map -> trim_punctuation -> de-dup (unless
    allow_duplicates) -> default (only when :default given and empty).

    Unknown options raise, mirroring marc21.rb:67-69.

    Build fast path (r16): for the common spec shape (datafield-only,
    no indicator filters, alternate_script='include') the extraction
    tree is rendered as ONE generated-SQL string (`F.expr`) instead of
    hundreds of Py4J round trips — the option wrappers stay tiny Column
    calls on top. ``_sql_fastpath=False`` forces the generic Column
    builder (the parity-test hook; both paths are value-identical,
    pinned by tests + the marc_* oracle rows).
    """
    unknown = set(options) - EXTRACT_MARC_VALID_OPTIONS
    if unknown:
        raise ValueError(f"Unknown extract_marc options: {sorted(unknown)}")

    first = options.get("first", False)
    trim = options.get("trim_punctuation", False)
    has_default = "default" in options
    default_value = options.get("default")
    allow_duplicates = options.get("allow_duplicates", False)
    separator = options.get("separator", " ")
    alternate_script = options.get("alternate_script", "include")

    tmap = options.get("translation_map")
    if tmap is not None and not isinstance(tmap, TranslationMap):
        tmap = TranslationMap(tmap)

    # parse NOW: spec errors surface at definition time, like the
    # reference's config-load validation (marc_extractor_spec.rb:192-194)
    parsed_spec = parse_marc_spec(spec)

    def macro(acc: Column, ctx=None) -> Column:
        vals = None
        if _sql_fastpath:
            src = getattr(ctx, "_pipeline", None)
            src_col = (
                getattr(src, "source_col", None) if src is not None else "marc"
            )
            if src_col and _ident_safe(src_col):
                sql = _extract_sql(
                    f"`{src_col}`", parsed_spec, separator, alternate_script
                )
                if sql is not None:
                    vals = F.expr(sql)
        if vals is None:
            vals = marc_extract(
                ctx.marc if ctx is not None else F.col("marc"),
                parsed_spec,
                separator=separator,
                alternate_script=alternate_script,
            )
        # the reference applies options to the shared accumulator, i.e.
        # including values appended by earlier macros in the same rule
        out = F.concat(acc, vals)
        if first:
            # Array(accumulator[0]) in the reference (marc21.rb first!):
            # a NIL first element becomes [], NOT [nil] — so :default can
            # still fire (e.g. an out-of-range byteslice yields null). A
            # bare slice(out, 1, 1) would keep [null] and block it.
            out = F.filter(F.slice(out, 1, 1), lambda x: x.isNotNull())
        if tmap is not None:
            out = tmap.translate_array_expr(out)
        if trim:
            out = F.transform(out, trim_punctuation_expr)
        if not allow_duplicates:
            out = F.array_distinct(out)
        if has_default:
            # cast: a non-string default (e.g. default=0) would build an
            # array<int> branch that fails analysis against the string
            # accumulator; None stays a null element (the reference
            # appends nil on has_key?(:default), marc21.rb:136-138, and
            # output post-processing drops it)
            out = F.when(
                F.size(out) == 0,
                F.array(F.lit(default_value).cast("string")),
            ).otherwise(out)
        return out

    return macro


def extract_all_marc_values(
    from_tag: str = "100", to_tag: str = "899", separator: Optional[str] = " "
):
    """All subfield values of data fields with from <= tag <= to, one
    joined string per field (marc21.rb:213-238)."""

    def macro(acc: Column, ctx=None) -> Column:
        fields = F.filter(
            ctx.marc["datafields"],
            lambda f: f["tag"].between(from_tag, to_tag),
        )

        def per_field(f: Column) -> Column:
            vals = F.transform(f["subfields"], lambda sf: sf["value"])
            if separator is None:
                # guard NULL subfields arrays (schema-legal in user
                # parquet): a NULL contribution would null the whole
                # record's flatten; the joined branch below is already
                # safe (size(NULL) > 0 is NULL -> otherwise-empty)
                return F.coalesce(vals, F.array().cast("array<string>"))
            return F.when(
                F.size(vals) > 0, F.array(F.array_join(vals, separator))
            ).otherwise(F.array().cast("array<string>"))

        # coalesce the OUTER array too: marc.datafields = NULL is
        # schema-legal in user parquet, and transform(NULL) -> NULL
        # would ride concat() and wipe earlier macros' contributions to
        # the same field (every other macro guards this via the
        # extractor's coalesce)
        return F.concat(
            acc,
            F.coalesce(
                F.flatten(F.transform(fields, per_field)),
                F.array().cast("array<string>"),
            ),
        )

    return macro


def serialized_marc(
    format: str = "json",
    binary_escape: bool = True,
    allow_oversized: bool = False,
    encoding: str = "utf-8",
):
    """Re-serialize the whole record (marc21.rb:174-198).

    ``json`` -> canonical marc-in-json; ``xml`` -> MARCXML; ``binary`` ->
    ISO 2709, base64-encoded by default (binary_escape);
    ``allow_oversized`` writes zeroed length slots for records/fields
    too long for ISO 2709's fixed-width directory instead of raising
    (marc21.rb:181, MARC::Writer.encode). ``encoding`` (binary only)
    selects the value byte encoding — any codec name or ``MARC-8`` /
    ``MARC-8-preserve`` through the LoC converter with lossless NCR
    fallback; leader/09 is forced to match the bytes written (see
    :func:`traject_spark.marc.serialize.to_iso2709`). Row-level
    serialization runs in an Arrow-batched pandas UDF over the record's
    JSON projection — a sink-side path, not the hot mapping path.
    """
    from traject_spark.marc import serialize as ser

    fmt = str(format)
    if fmt not in ("json", "xml", "binary"):
        raise ValueError(f"serialized_marc format must be json/xml/binary, got {fmt!r}")

    @pandas_udf("string")
    def _serialize(js: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            rec = ser.struct_json_to_record(text)
            if fmt == "json":
                return ser.to_marc_in_json(rec)
            if fmt == "xml":
                return ser.to_marcxml(rec)
            raw = ser.to_iso2709(rec, allow_oversized, encoding=encoding)
            if binary_escape:
                # Ruby Base64.encode64 (marc21.rb:189) emits RFC-2045
                # line-wrapped output: a newline every 60 chars AND a
                # trailing newline — byte-identical output matters to
                # consumers that line-split before decoding
                enc = base64.b64encode(raw).decode("ascii")
                return (
                    "\n".join(
                        enc[i : i + 60] for i in range(0, len(enc), 60)
                    )
                    + "\n"
                    if enc
                    else ""
                )
            return raw.decode("utf-8", errors="replace")

        return js.map(one)

    def macro(acc: Column, ctx=None) -> Column:
        rec_json = F.to_json(ctx.marc)
        return F.concat(acc, F.array(_serialize(rec_json)))

    return macro
