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
    # leader: positions 5-11 and 17-23 pass through; 0-4/12-16 are the
    # recomputed length/base digits
    assert back["leader"][5:12] == rec["leader"][5:12]
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
