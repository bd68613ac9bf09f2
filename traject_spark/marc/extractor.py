"""Compile MarcSpec lists into a single intra-row Column expression.

Semantics mirrored from the reference extractor
(lib/traject/marc_extractor.rb:205-270):

- iterate record fields in document order; for each field, every spec
  registered for its (effective) tag contributes, in declaration order;
- control fields yield ``value.byteslice(bytes)`` (or the whole value when
  the spec carries no byte range);
- data fields yield subfield values filtered by the spec's codes, in
  subfield order; when a separator is configured and the spec is
  "joinable" (zero or 2+ codes, or a doubled code) the values of ONE field
  are joined into ONE string;
- alternate-script: with mode ``include`` (default) an 880 field is matched
  as if it had the tag named by the first 3 bytes of its ``$6`` (falling
  back to ``880`` when ``$6`` is absent); ``only`` restricts matching to
  880 fields; ``False`` disables the rewrite entirely
  (lib/traject/marc_extractor.rb:112-158, marc_extractor_spec.rb:51-67).

The compiled expression is pure array algebra over the nested struct — no
explode, no join, no shuffle. On a cluster this stays inside one
whole-stage-codegen'd narrow stage regardless of data size.

Note on ordering: the reference interleaves control/data fields in record
order; in practice control fields (001-009) physically precede data fields,
so this implementation emits control-spec results first. Documented
deviation for pathological out-of-order records.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from traject_spark.marc.spec import ALTERNATE_SCRIPT_TAG, MarcSpec, parse_marc_spec

EMPTY_STR_ARRAY = "array<string>"


def _empty() -> Column:
    return F.array().cast(EMPTY_STR_ARRAY)


def _byteslice(value: Column, spec: MarcSpec) -> Column:
    """Ruby String#byteslice semantics on ASCII fixed fields.

    byteslice(n)    -> nil when n >= length       (single byte form)
    byteslice(n..m) -> '' when n == length, nil when n > length, partial
                       result when m >= length
    (lib/traject/marc_extractor.rb:209-217; fixed fields are ASCII so
    byte == char and substring is safe — SURVEY §4 trap 6.)
    """
    start = spec.bytes_start
    if spec.bytes_end is None:
        return F.when(
            F.length(value) > start, F.substring(value, start + 1, 1)
        ).otherwise(F.lit(None).cast("string"))
    return F.when(
        F.length(value) >= start,
        F.substring(value, start + 1, spec.byte_length),
    ).otherwise(F.lit(None).cast("string"))


def _control_contribution(f: Column, spec: MarcSpec) -> Column:
    """One control FIELD x one spec -> array (0/1 elements, may hold null).

    Matching against control fields is by tag only; the control branch uses
    the spec's byte range if present, else the whole value — even for
    subfield-carrying specs (lib/traject/marc_extractor.rb:210-214 checks
    the FIELD kind, not the spec kind).
    """
    if spec.is_byte_spec:
        val = _byteslice(f["value"], spec)
    else:
        val = f["value"]
    return F.when(f["tag"] == spec.tag, F.array(val)).otherwise(_empty())


def _data_contribution(
    f: Column, eff_tag: Column, spec: MarcSpec, separator: Optional[str]
) -> Column:
    """One data FIELD x one spec -> array of extracted strings."""
    cond = eff_tag == spec.tag
    if spec.ind1 is not None:
        cond = cond & (f["ind1"] == spec.ind1)
    if spec.ind2 is not None:
        cond = cond & (f["ind2"] == spec.ind2)

    if spec.subfields is None:
        kept = f["subfields"]
    else:
        codes = list(spec.subfields)
        kept = F.filter(f["subfields"], lambda sf: sf["code"].isin(codes))
    vals = F.transform(kept, lambda sf: sf["value"])

    if separator is not None and spec.joinable:
        # join values of ONE field into ONE string; an empty match stays an
        # empty array, not [''] (lib/traject/marc_extractor.rb:258-270)
        vals = F.when(
            F.size(vals) > 0, F.array(F.array_join(vals, separator))
        ).otherwise(_empty())
    return F.when(cond, vals).otherwise(_empty())


def _effective_tag(f: Column) -> Column:
    """880 -> first 3 bytes of first $6, falling back to '880' when absent
    (lib/traject/marc_extractor_spec.rb:58-67)."""
    # F.get is null-safe on empty arrays (ANSI mode: element_at throws)
    six = F.get(
        F.filter(f["subfields"], lambda sf: sf["code"] == "6"), 0
    )["value"]
    return F.when(
        f["tag"] == ALTERNATE_SCRIPT_TAG,
        F.coalesce(F.substring(six, 1, 3), F.lit(ALTERNATE_SCRIPT_TAG)),
    ).otherwise(f["tag"])


def _concat_arrays(parts: list[Column]) -> Column:
    if not parts:
        return _empty()
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


def marc_extract(
    marc: Column,
    spec: Union[str, Sequence[str], list],
    separator: Optional[str] = " ",
    alternate_script: Union[str, bool] = "include",
) -> Column:
    """Compile a spec into one ``array<string>`` Column over ``marc``.

    The result may contain NULL elements (out-of-range byte slices) —
    matching the reference, where nils survive in the accumulator until
    ``add_output`` drops them (lib/traject/indexer/context.rb:117-129);
    ``Pipeline`` applies that drop at output time.
    """
    if isinstance(spec, list) and spec and isinstance(spec[0], MarcSpec):
        specs = spec
    else:
        specs = parse_marc_spec(spec)

    control_tags = {s.tag for s in specs}

    # --- control fields: match by tag, byte-slice or whole value ---------
    ctrl_fields = F.filter(
        marc["controlfields"],
        lambda f: reduce(
            lambda a, b: a | b, [f["tag"] == t for t in sorted(control_tags)]
        ),
    )
    ctrl_per_field = lambda f: _concat_arrays(  # noqa: E731
        [_control_contribution(f, s) for s in specs]
    )
    ctrl_part = F.flatten(F.transform(ctrl_fields, ctrl_per_field))

    # --- data fields: effective-tag match, indicator filter, collect -----
    if alternate_script == "only":
        considered = F.filter(
            marc["datafields"], lambda f: f["tag"] == ALTERNATE_SCRIPT_TAG
        )
    else:
        considered = marc["datafields"]

    use_alt = alternate_script in ("include", "only")

    def data_per_field(f: Column) -> Column:
        eff = _effective_tag(f) if use_alt else f["tag"]
        return _concat_arrays(
            [_data_contribution(f, eff, s, separator) for s in specs]
        )

    data_part = F.flatten(F.transform(considered, data_per_field))

    return F.coalesce(
        F.concat(ctrl_part, data_part),
        ctrl_part,
        data_part,
        _empty(),
    )
