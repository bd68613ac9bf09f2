"""Property-based round-trip tests for the record codecs (hypothesis).

The reference's serialization tests cover a handful of fixtures; these
cover the space: any record built from printable unicode must survive
struct -> iso2709/marc-in-json/marcxml -> struct unchanged (iso2709
modulo the leader's recomputed length/base digits)."""

from hypothesis import given, settings, strategies as st

from traject_spark.marc.serialize import (
    from_iso2709,
    from_marc_in_json,
    to_iso2709,
    to_marc_in_json,
    to_marcxml,
)
from traject_spark.marc.io import parse_marcxml

# ISO 2709 reserves \x1d\x1e\x1f; XML 1.0 forbids most C0 controls
_value = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),
        blacklist_characters="\x1d\x1e\x1f",
    ),
    max_size=40,
)
_tag = st.from_regex(r"[0-9]{3}", fullmatch=True)
_code = st.from_regex(r"[a-z0-9]", fullmatch=True)
_ind = st.sampled_from([" ", "0", "1", "2", "9"])

_controlfield = st.fixed_dictionaries(
    {"tag": st.from_regex(r"00[1-9]", fullmatch=True), "value": _value}
)
_subfield = st.fixed_dictionaries({"code": _code, "value": _value})
_datafield = st.fixed_dictionaries(
    {
        "tag": st.from_regex(r"[1-9][0-9]{2}", fullmatch=True),
        "ind1": _ind,
        "ind2": _ind,
        "subfields": st.lists(_subfield, min_size=1, max_size=5),
    }
)
_record = st.fixed_dictionaries(
    {
        "leader": st.from_regex(r"[0-9]{5}[a-z ]{19}", fullmatch=True),
        "controlfields": st.lists(_controlfield, max_size=4),
        "datafields": st.lists(_datafield, max_size=6),
    }
)


def _fields_equal(a: dict, b: dict) -> bool:
    return (
        a["controlfields"] == b["controlfields"]
        and a["datafields"] == b["datafields"]
    )


@settings(max_examples=150, deadline=None)
@given(_record)
def test_iso2709_roundtrip(rec):
    back = from_iso2709(to_iso2709(rec))
    assert back is not None
    assert _fields_equal(rec, back)
    # leader: positions 5-8/10-11 and 17-23 pass through; 0-4/12-16 are
    # the recomputed length/base digits; 9 is the coding scheme, forced
    # to 'a' by the default utf-8 write path (advice r12)
    assert back["leader"][5:9] == rec["leader"][5:9]
    assert back["leader"][9] == "a"
    assert back["leader"][10:12] == rec["leader"][10:12]
    assert back["leader"][17:24] == rec["leader"][17:24].ljust(7)[:7]
    assert back["leader"][:5].isdigit() and back["leader"][12:17].isdigit()


@settings(max_examples=150, deadline=None)
@given(_record)
def test_marc_in_json_roundtrip(rec):
    back = from_marc_in_json(to_marc_in_json(rec))
    assert _fields_equal(rec, back)
    assert back["leader"] == rec["leader"]


@settings(max_examples=150, deadline=None)
@given(_record)
def test_marcxml_roundtrip(rec):
    recs = parse_marcxml(to_marcxml(rec))
    assert len(recs) == 1
    assert _fields_equal(rec, recs[0])
    assert recs[0]["leader"] == rec["leader"]


def test_iso2709_oversized_record():
    """ISO 2709 length slots are fixed-width: >99999-byte records raise
    unless allow_oversized, which zeroes the overflowing slots (the
    reference's MARC::Writer.encode allow_oversized flag)."""
    import pytest

    big = {
        "leader": "0" * 24,
        "controlfields": [],
        "datafields": [
            {
                "tag": "500",
                "ind1": " ",
                "ind2": " ",
                "subfields": [{"code": "a", "value": "x" * 12000}],
            }
        ],
    }
    with pytest.raises(ValueError):
        to_iso2709(big)
    raw = to_iso2709(big, allow_oversized=True)
    # field-length slot (4 digits, bytes 27-31 of the directory entry)
    # and record-length slot both zeroed; payload intact
    assert raw[:5] != b"00000" or len(raw) <= 100000  # record fits 5 digits
    assert raw[27:31] == b"0000"  # 12000-byte field overflows its slot
    assert b"x" * 12000 in raw


@settings(max_examples=5, deadline=None)
@given(st.lists(_record, min_size=1, max_size=8))
def test_jvm_ndjson_parse_property(spark, tmp_path_factory, recs):
    """The JVM VARIANT parse must reconstruct ANY generated record batch
    exactly (leader + fields + subfields), matching the Python codec."""
    from traject_spark.marc.io import read_marc_json

    d = tmp_path_factory.mktemp("prop_ndj")
    (d / "r.ndjson").write_text(
        "\n".join(to_marc_in_json(r) for r in recs)
    )
    out = read_marc_json(spark, str(d / "r.ndjson"), engine="jvm").collect()
    assert len(out) == len(recs)

    def as_dict(m):
        return {
            "leader": m["leader"],
            "controlfields": [c.asDict() for c in m["controlfields"]],
            "datafields": [
                {**f.asDict(), "subfields": [s.asDict() for s in f["subfields"]]}
                for f in m["datafields"]
            ],
        }

    got = sorted(
        (as_dict(r["marc"]) for r in out),
        key=lambda r: (r["leader"], str(r)),
    )
    want = sorted(recs, key=lambda r: (r["leader"], str(r)))
    for g, w in zip(got, want):
        assert g == w


def test_iso2709_oversized_roundtrip():
    """Zeroed slots from allow_oversized must still round-trip through
    from_iso2709 (the forgiving-reader scan: zero length -> next FT,
    zero offset -> previous field's end)."""
    from traject_spark.marc.serialize import from_iso2709

    rec = {
        "leader": " " * 24,
        "controlfields": [{"tag": "001", "value": "big1"}],
        "datafields": [
            {
                "tag": "500",
                "ind1": " ",
                "ind2": " ",
                "subfields": [{"code": "a", "value": "x" * 12000}],
            },
            {
                "tag": "500",
                "ind1": "1",
                "ind2": "2",
                "subfields": [{"code": "a", "value": "after oversized"}],
            },
        ],
    }
    raw = to_iso2709(rec, allow_oversized=True)
    back = from_iso2709(raw)
    assert back is not None
    assert back["controlfields"] == [{"tag": "001", "value": "big1"}]
    assert len(back["datafields"]) == 2
    assert back["datafields"][0]["subfields"][0]["value"] == "x" * 12000
    assert back["datafields"][1]["subfields"][0]["value"] == "after oversized"
    assert back["datafields"][1]["ind1"] == "1"


def test_iso2709_skipped_entry_invalidates_zero_offset_recovery():
    """A directory entry with non-numeric length/start is skipped; a LATER
    zeroed start must NOT be recovered from the stale pre-gap `pos` (it
    would read garbage bytes). The field is dropped instead."""
    from traject_spark.marc.serialize import FT, from_iso2709, to_iso2709

    rec = {
        "leader": " " * 24,
        "controlfields": [{"tag": "001", "value": "ok"}],
        "datafields": [
            {"tag": "500", "ind1": " ", "ind2": " ",
             "subfields": [{"code": "a", "value": "first"}]},
            {"tag": "520", "ind1": " ", "ind2": " ",
             "subfields": [{"code": "a", "value": "second"}]},
        ],
    }
    raw = bytearray(to_iso2709(rec))
    base = int(raw[12:17])
    # entry 1 (the 500): corrupt its length slot -> skipped
    e1 = 24 + 12
    raw[e1 + 3 : e1 + 7] = b"XXXX"
    # entry 2 (the 520): zero its start slot -> would trigger recovery
    e2 = 24 + 24
    raw[e2 + 7 : e2 + 12] = b"00000"
    back = from_iso2709(bytes(raw))
    assert back is not None
    assert back["controlfields"] == [{"tag": "001", "value": "ok"}]
    # the 520's zeroed start must not resolve via the stale pos: with
    # the chain broken the field is DROPPED, never read from a wrong
    # offset — no garbage field may surface under any tag
    assert all(df["tag"] != "520" for df in back["datafields"])
    for df in back["datafields"]:
        for sf in df.get("subfields", []):
            assert sf.get("value") in ("first", "second")


def test_marc_in_json_null_controlfield_value_roundtrip():
    """{"001": null} — a shape to_marc_in_json itself emits — must parse
    as a controlfield, not crash on body.get()."""
    rec = {
        "leader": " " * 24,
        "controlfields": [{"tag": "001", "value": None}],
        "datafields": [],
    }
    text = to_marc_in_json(rec)
    back = from_marc_in_json(text)
    assert back["controlfields"] == [{"tag": "001", "value": None}]


def test_serializers_tolerate_null_tag():
    """A null tag (schema allows it in user parquet) must not abort the
    serialization job."""
    rec = {
        "leader": " " * 24,
        "controlfields": [{"tag": None, "value": "v"}],
        "datafields": [
            {"tag": None, "ind1": " ", "ind2": " ",
             "subfields": [{"code": "a", "value": "t"}]}
        ],
    }
    assert to_marc_in_json(rec)
    assert to_marcxml(rec)
    assert to_iso2709(rec)


def test_marcxml_escapes_attribute_quotes():
    import xml.etree.ElementTree as ET

    rec = {
        "leader": " " * 24,
        "controlfields": [],
        "datafields": [
            {"tag": "245", "ind1": '"', "ind2": " ",
             "subfields": [{"code": '"', "value": 'has "quotes"'}]}
        ],
    }
    xml = to_marcxml(rec)
    root = ET.fromstring(xml)
    df = root.find("{http://www.loc.gov/MARC21/slim}datafield")
    assert df.get("ind1") == '"'
    assert df[0].get("code") == '"'


def test_split_iso2709_stream_strips_leading_padding():
    from traject_spark.marc.serialize import from_iso2709, split_iso2709_stream

    rec = {
        "leader": " " * 24,
        "controlfields": [{"tag": "001", "value": "r1"}],
        "datafields": [],
    }
    raw = to_iso2709(rec)
    stream = raw + b"\n" + raw + b"\r\n" + raw
    chunks = split_iso2709_stream(stream)
    assert len(chunks) == 3
    for c in chunks:
        back = from_iso2709(c)
        assert back is not None and back["controlfields"][0]["value"] == "r1"
