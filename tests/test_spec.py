"""Spec-string parser tests, mirroring reference coverage in
test/marc_extractor_test.rb (spec parsing cases)."""

import pytest

from traject_spark.marc.spec import MarcSpec, parse_marc_spec


def test_single_datafield():
    (s,) = parse_marc_spec("245abc")
    assert s.tag == "245"
    assert s.subfields == ("a", "b", "c")
    assert s.ind1 is None and s.ind2 is None
    assert s.joinable


def test_no_subfields_means_all():
    (s,) = parse_marc_spec("245")
    assert s.subfields is None
    assert s.joinable


def test_single_subfield_not_joinable():
    (s,) = parse_marc_spec("633a")
    assert not s.joinable


def test_doubled_code_joinable():
    (s,) = parse_marc_spec("020aa")
    assert s.subfields == ("a", "a")
    assert s.joinable


def test_indicators():
    (s,) = parse_marc_spec("245|01|ab")
    assert s.ind1 == "0" and s.ind2 == "1"


def test_indicator_wildcard_and_blank():
    (s,) = parse_marc_spec("245|*1|ab")
    assert s.ind1 is None and s.ind2 == "1"
    (s,) = parse_marc_spec("245| 1|ab")
    assert s.ind1 == " " and s.ind2 == "1"


def test_controlfield_byte_range():
    (s,) = parse_marc_spec("008[35-37]")
    assert s.is_byte_spec
    assert s.bytes_start == 35 and s.bytes_end == 37
    assert s.byte_length == 3


def test_controlfield_single_byte():
    (s,) = parse_marc_spec("007[5]")
    assert s.bytes_start == 5 and s.bytes_end is None
    assert s.byte_length == 1


def test_multi_spec_order_preserved():
    specs = parse_marc_spec("245a:245abc:008[35-37]")
    assert [s.tag for s in specs] == ["245", "245", "008"]
    assert specs[0].subfields == ("a",)
    assert specs[1].subfields == ("a", "b", "c")


def test_whitespace_around_colon():
    specs = parse_marc_spec("245a : 700a")
    assert [s.tag for s in specs] == ["245", "700"]


def test_list_input():
    specs = parse_marc_spec(["245a", "700a:710a"])
    assert [s.tag for s in specs] == ["245", "700", "710"]


def test_invalid_spec_raises():
    with pytest.raises(ValueError):
        parse_marc_spec("24")
    with pytest.raises(ValueError):
        parse_marc_spec("245|0|a")
