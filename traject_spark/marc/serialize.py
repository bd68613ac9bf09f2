"""Pure-python MARC serialization: marc-in-json, MARCXML, ISO 2709 binary.

Used by the ``serialized_marc`` macro (reference:
lib/traject/macros/marc21.rb:174-198) and the binary/XML ingest sources.
These run row-at-a-time inside Arrow-batched pandas UDFs — serialization
is a sink-side concern, not the hot mapping path.

ISO 2709 layout (public spec): 24-byte leader; directory of 12-byte
entries (3 tag + 4 length + 5 start); field terminator 0x1E; subfield
delimiter 0x1F; record terminator 0x1D.
"""

from __future__ import annotations

import json
from typing import Optional
from xml.sax.saxutils import escape

FT = b"\x1e"  # field terminator
SD = b"\x1f"  # subfield delimiter
RT = b"\x1d"  # record terminator


def struct_json_to_record(text: str) -> dict:
    """Parse ``F.to_json(marc_struct)`` output back into a record dict
    (the struct's JSON shape IS the record-dict shape; absent keys filled)."""
    rec = json.loads(text)
    rec.setdefault("leader", " " * 24)
    rec.setdefault("controlfields", [])
    rec.setdefault("datafields", [])
    return rec


def to_marc_in_json(rec: dict) -> str:
    """Canonical marc-in-json: {"leader": ..., "fields": [...]} — the shape
    the reference writes via record.to_hash (marc21.rb:193-194) and reads
    via NDJReader (ndj_reader.rb:29-35)."""
    # .get("value"): F.to_json omits null struct fields, so a NULL
    # subfield/controlfield value arrives with the key MISSING — direct
    # indexing would abort the whole serialization job on one bad record
    # .get("tag"): same omitted-key hazard as values — one null-tag record
    # must not abort the whole serialization job
    fields = []
    for cf in rec.get("controlfields") or []:
        fields.append({cf.get("tag") or "": cf.get("value")})
    for df in rec.get("datafields") or []:
        fields.append(
            {
                df.get("tag") or "": {
                    "ind1": df.get("ind1") or " ",
                    "ind2": df.get("ind2") or " ",
                    "subfields": [
                        {sf.get("code") or "": sf.get("value")}
                        for sf in (df.get("subfields") or [])
                    ],
                }
            }
        )
    return json.dumps(
        {"leader": rec.get("leader") or " " * 24, "fields": fields},
        ensure_ascii=False,
        separators=(",", ":"),
    )


# ruby-marc's default MARC::ControlField.control_tags set ("tag must be
# in 001-009"): field-kind dispatch in new_from_hash is TAG-based — an
# object body under a control tag raises in DataField#initialize, a
# non-object body under a data tag raises in ControlField#initialize,
# and either way the NDJReader's per-line rescue drops the record.
CONTROL_TAGS = frozenset(f"00{i}" for i in range(1, 10))


def _scalar_str(v):
    """None/str pass through; other JSON scalars project to their JSON
    text (the same cast the JVM variant engine applies)."""
    if v is None or isinstance(v, str):
        return v
    return json.dumps(v, ensure_ascii=False, separators=(",", ":"))


def from_marc_in_json(text: str) -> dict:
    """Inverse of to_marc_in_json -> the nested-struct record dict.

    Mirrors MARC::Record.new_from_hash reachable through the NDJReader
    rescue (ndj_reader.rb:30-34): raises on the shapes ruby-marc raises
    on (object body under a control tag, scalar body under a data tag,
    non-array ``subfields``), so callers' per-line rescue drops the same
    lines.  A non-string scalar under a control tag survives in ruby
    (duck typing); the typed schema here projects it to its JSON text
    ({"001": 42} -> "42"), matching the JVM engine's variant cast.
    ``{"001": null}`` — a shape to_marc_in_json itself emits for a NULL
    controlfield value — round-trips as a NULL value."""
    obj = json.loads(text)
    # leader goes through the same scalar coercion as every other string
    # slot: an uncoerced int/dict leader would fail the whole Arrow batch
    # conversion (aborting the job), not just this line; the JVM engine's
    # variant->string cast projects the same JSON text
    out = {
        "leader": _scalar_str(obj.get("leader")) or " " * 24,
        "controlfields": [],
        "datafields": [],
    }
    for fld in obj.get("fields") or []:
        for tag, body in fld.items():
            if isinstance(body, dict):
                if tag in CONTROL_TAGS:
                    raise ValueError(f"object body under control tag {tag}")
                sfs_in = body.get("subfields")
                if not isinstance(sfs_in, list):
                    # ruby: field['subfields'].each on nil/scalar raises
                    raise ValueError(f"field {tag} subfields is not a list")
                sfs = []
                for sf in sfs_in:
                    for code, value in sf.items():
                        # non-string scalar values survive in ruby (duck
                        # typing); project to JSON text for the typed
                        # schema — an uncoerced int would crash the whole
                        # Arrow batch conversion, not just this line
                        sfs.append({"code": code, "value": _scalar_str(value)})
                out["datafields"].append(
                    {
                        "tag": tag,
                        "ind1": _scalar_str(body.get("ind1", " ")),
                        "ind2": _scalar_str(body.get("ind2", " ")),
                        "subfields": sfs,
                    }
                )
            else:
                if tag not in CONTROL_TAGS:
                    raise ValueError(f"non-object body under data tag {tag}")
                out["controlfields"].append(
                    {"tag": tag, "value": _scalar_str(body)}
                )
    return out


_ATTR_ESCAPES = {'"': "&quot;"}


def _attr(s: str) -> str:
    """Escape a string for an XML attribute VALUE position: saxutils.escape
    alone leaves double quotes alone, so a quote in tag/ind/code (lenient
    binary decode can produce one) would break the attribute out of its
    quotes and emit unparseable XML."""
    return escape(s, _ATTR_ESCAPES)


def to_marcxml(rec: dict) -> str:
    parts = [
        '<record xmlns="http://www.loc.gov/MARC21/slim">',
        f"<leader>{escape(rec.get('leader') or ' ' * 24)}</leader>",
    ]
    for cf in rec.get("controlfields") or []:
        parts.append(
            f'<controlfield tag="{_attr(cf.get("tag") or "")}">{escape(cf.get("value") or "")}</controlfield>'
        )
    for df in rec.get("datafields") or []:
        parts.append(
            f'<datafield tag="{_attr(df.get("tag") or "")}" ind1="{_attr(df.get("ind1") or " ")}"'
            f' ind2="{_attr(df.get("ind2") or " ")}">'
        )
        for sf in df.get("subfields") or []:
            parts.append(
                f'<subfield code="{_attr(sf.get("code") or "")}">{escape(sf.get("value") or "")}</subfield>'
            )
        parts.append("</datafield>")
    parts.append("</record>")
    return "".join(parts)


def _value_encoder(encoding: str):
    """str -> bytes for one field/subfield value on the WRITE side.
    'MARC-8' routes through the LoC converter with NCR fallback (the
    standard\'s lossless &#xHHHH; escape) so any Unicode value is
    writable; anything else is a Python codec name, STRICT: a value the
    codec cannot carry raises instead of silently writing '?' — replace
    is the documented posture for the READ side only (review r12)."""
    enc = (encoding or "utf-8").strip().lower().replace("_", "-")
    if enc in ("marc-8", "marc8", "marc-8-preserve", "marc8-preserve"):
        # the -preserve alias is accepted for read/write symmetry: the
        # encoder already emits preserve-parked bytes verbatim
        from traject_spark.marc.marc8 import unicode_to_marc8

        return lambda s: unicode_to_marc8(s, ncr_fallback=True)
    codec = (encoding or "utf-8").strip() or "utf-8"
    return lambda s: s.encode(codec)


def to_iso2709(
    rec: dict, allow_oversized: bool = False, encoding: str = "utf-8"
) -> bytes:
    """Encode one record as ISO 2709 binary MARC.

    Directory/leader length slots are fixed-width decimal; a record or
    field too long to fit raises unless ``allow_oversized``, in which
    case the overflowing slots are written as zeros (the reference's
    MARC::Writer.encode(record, allow_oversized) behavior — readers that
    scan for field/record terminators can still parse such records).
    ``encoding`` applies to field/subfield VALUES (tags, indicators and
    the leader are spec-ASCII): a codec name or 'MARC-8' (values through
    the LoC converter, unencodable chars as lossless &#xHHHH; numeric
    character references — see :func:`_value_encoder`).
    """
    enc = _value_encoder(encoding)
    field_bytes: list[tuple[str, bytes]] = []
    for cf in rec.get("controlfields") or []:
        field_bytes.append(
            (cf.get("tag") or "", enc(cf.get("value") or "") + FT)
        )
    for df in rec.get("datafields") or []:
        body = (df.get("ind1") or " ").encode("utf-8") + (
            df.get("ind2") or " "
        ).encode("utf-8")
        for sf in df.get("subfields") or []:
            body += (
                SD
                + (sf.get("code") or "").encode("utf-8")
                + enc(sf.get("value") or "")
            )
        field_bytes.append((df.get("tag") or "", body + FT))

    def slot(n: int, width: int, what: str) -> str:
        if n < 10**width:
            return f"{n:0{width}d}"
        if allow_oversized:
            return "0" * width
        raise ValueError(
            f"{what} length {n} exceeds ISO 2709's {width}-digit slot; "
            "pass allow_oversized=True to write zeros instead"
        )

    directory = b""
    data = b""
    for tag, body in field_bytes:
        directory += (
            f"{tag:>3.3}" + slot(len(body), 4, f"field {tag}")
            + slot(len(data), 5, f"field {tag} offset")
        ).encode("ascii", "replace")
        # 'replace', like the leader below: directory entries must be
        # exactly 12 BYTES each — a non-ASCII tag (legal in the
        # string-typed schema, producible by JSON ingest) must degrade
        # THIS record's tag to '?', not UnicodeEncodeError the whole
        # Arrow serialization batch
        data += body
    directory += FT
    base = 24 + len(directory)
    total = base + len(data) + 1
    # normalize to exactly 24 chars: a short/overlong leader (user JSON
    # passes leaders through verbatim) would otherwise desynchronize the
    # written bytes from the length/base slots and corrupt the record
    leader = ((rec.get("leader") or "")[:24]).ljust(24)
    # leader/09 (character coding scheme) must describe the bytes this
    # call actually wrote: ' ' = MARC-8, 'a' = UCS/Unicode (advice r12
    # — a UTF-8-sourced record written as MARC-8 would otherwise
    # self-describe as Unicode and external readers keying on leader/09,
    # e.g. pymarc to_unicode, would misdecode it). Other codecs have no
    # defined leader/09 value and pass the caller's byte through.
    enc_name = (encoding or "utf-8").strip().lower().replace("_", "-")
    if enc_name in ("marc-8", "marc8", "marc-8-preserve", "marc8-preserve"):
        coding = " "
    elif enc_name in ("", "utf-8", "utf8"):
        coding = "a"
    else:
        coding = leader[9]
    leader = (
        slot(total, 5, "record") + leader[5:9] + coding + leader[10:12]
        + slot(base, 5, "record base") + leader[17:24]
    )
    # the leader must be exactly 24 BYTES (offsets count from it): any
    # non-ASCII char would multi-byte-encode and shift every offset
    return leader.encode("ascii", "replace") + directory + data + RT


def _decoder(encoding: str):
    """bytes -> str for one MARC field/subfield value. 'MARC-8' (the
    reference's marc_source.encoding = 'MARC-8', marc_reader.rb:27-35)
    routes through the LoC escape-sequence converter with
    :invalid => :replace parity; anything else is a Python codec name.
    MARC-8 designations are resolved per decoded value (per subfield),
    matching ruby-marc's per-value transcoding — MARC 21 requires
    fields to return to the default sets, and vendor data re-designates
    per subfield in practice."""
    enc = (encoding or "utf-8").strip().lower().replace("_", "-")
    if enc in ("marc-8", "marc8"):
        from traject_spark.marc.marc8 import marc8_decoder

        return marc8_decoder()
    if enc in ("marc-8-preserve", "marc8-preserve"):
        # byte-preserving posture for sets with no bundled table (EACC
        # CJK, Extended Arabic): unmapped spans land on plane-15 PUA
        # codepoints instead of U+FFFD, and to_iso2709(encoding='MARC-8')
        # emits them back verbatim — read->write round-trips
        # byte-identically even through scripts the converter can't map
        from traject_spark.marc.marc8 import marc8_decoder

        return marc8_decoder("preserve")
    # the normalized-empty check above implies None/'' mean utf-8 —
    # decode with a whitespace-stripped name so ' latin-1 ' (which the
    # marc8 check already treats as non-MARC-8) resolves as a codec
    # instead of raising LookupError per value on executors
    codec = (encoding or "utf-8").strip() or "utf-8"
    return lambda b: b.decode(codec, errors="replace")


def from_iso2709(raw: bytes, encoding: str = "utf-8") -> Optional[dict]:
    """Decode one ISO 2709 record (lenient: bad fields skipped, mirroring
    the reference readers' per-record error-skip policy). ``encoding``
    accepts Python codec names or 'MARC-8' (see :func:`_decoder`)."""
    if len(raw) < 24:
        return None
    dec = _decoder(encoding)
    leader = dec(raw[:24])
    try:
        base = int(raw[12:17])
    except ValueError:
        return None
    directory = raw[24 : base - 1]
    out = {"leader": leader, "controlfields": [], "datafields": []}
    data_region = raw[base:]
    pos = 0  # expected start of the next field (directory order)
    for i in range(0, len(directory) - 11, 12):
        entry = directory[i : i + 12]
        tag = dec(entry[:3])
        try:
            length = int(entry[3:7])
            start = int(entry[7:12])
        except ValueError:
            # a skipped entry breaks the end-of-previous-field chain:
            # the NEXT field's zeroed start can no longer be recovered
            # from pos (it would point at the field before the gap)
            pos = -1
            continue
        # allow_oversized zeroes slots that overflow their fixed width;
        # recover by scanning like the reference's forgiving readers: a
        # zeroed offset (except for the first field) means "where the
        # previous field ended", and a zeroed length (a real body is >=1
        # byte, it always ends with FT) means "up to the next FT".
        if start == 0 and pos > 0:
            start = pos
        elif start == 0 and pos < 0:
            # recovery chain broken by a skipped entry: a zeroed start
            # here cannot be resolved — reading from offset 0 would
            # return some earlier field's bytes. Drop the field.
            continue
        if length == 0:
            end = data_region.find(FT, start)
            if end == -1:
                continue
            length = end - start + 1
        pos = start + length
        body = data_region[start : start + length]
        body = body.rstrip(FT)
        if tag in CONTROL_TAGS:
            # the canonical ruby-marc control-tag set (001-009): "000" or
            # alphanumeric "00x" tags are DataFields there, and the JSON/
            # XML serializers here dispatch on the same set — a wider
            # predicate would make an ISO round-trip drop those records
            out["controlfields"].append(
                {"tag": tag, "value": dec(body)}
            )
        else:
            ind1 = dec(body[0:1]) or " "
            ind2 = dec(body[1:2]) or " "
            sfs = []
            for chunk in body[2:].split(SD):
                if not chunk:
                    continue
                code = dec(chunk[:1])
                value = dec(chunk[1:])
                sfs.append({"code": code, "value": value})
            out["datafields"].append(
                {"tag": tag, "ind1": ind1, "ind2": ind2, "subfields": sfs}
            )
    return out


def split_iso2709_stream(raw: bytes) -> list[bytes]:
    """Split a concatenated ISO 2709 stream on record terminators."""
    out = []
    for chunk in raw.split(RT):
        if chunk.strip(b"\x00\r\n "):
            # newline-separated records (common vendor format): leading
            # padding would shift the 24-byte leader and lose the record
            out.append(chunk.lstrip(b"\x00\r\n ") + RT)
    return out
