"""Property test: the java-properties parser round-trips an escape-writer.

``_parse_properties`` mirrors java.util.Properties#load; this builds the
matching *store* direction (escape like Properties#store) for random
key/value pairs and asserts parse(store(d)) == d — pinning separator
handling, escapes, continuations-by-accident (trailing backslashes), and
whitespace keys that a regex-based parser silently dropped.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from traject_spark.translation_map import _parse_properties

# printable-ish text plus the troublemakers the escape rules exist for
_CHARS = st.characters(
    min_codepoint=1,
    max_codepoint=0x2FF,
    blacklist_categories=("Cs",),
)
_TEXT = st.text(_CHARS, min_size=0, max_size=30)


def _store_escape(s: str, is_key: bool) -> str:
    """java.util.Properties#store escaping (the subset load() reverses)."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\f":
            out.append("\\f")
        elif ch in "=:#!":
            out.append("\\" + ch)
        elif ch == " " and is_key:
            out.append("\\ ")
        elif ord(ch) < 0x20 or ord(ch) > 0x7E:
            out.append("\\u%04x" % ord(ch))
        else:
            out.append(ch)
    # a leading space in a VALUE would be eaten by the separator-space
    # skip; Properties#store escapes the first leading space run
    res = "".join(out)
    if not is_key:
        i = 0
        while i < len(res) and res[i] == " ":
            i += 1
        res = "\\ " * i + res[i:]
    return res


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.text(_CHARS, min_size=1, max_size=20), _TEXT, max_size=8
    )
)
def test_parse_properties_round_trip(d):
    text = "\n".join(
        f"{_store_escape(k, True)}={_store_escape(v, False)}"
        for k, v in d.items()
    )
    assert _parse_properties(text) == d


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.text(_CHARS, min_size=1, max_size=12),
                       _TEXT, max_size=5))
def test_parse_properties_space_separator_round_trip(d):
    """The whitespace-separator form real traject .properties maps use."""
    text = "\n".join(
        f"{_store_escape(k, True)} {_store_escape(v, False)}"
        for k, v in d.items()
    )
    assert _parse_properties(text) == d
