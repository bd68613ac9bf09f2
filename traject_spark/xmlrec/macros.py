"""extract_xpath macro (reference: lib/traject/macros/nokogiri_macros.rb:13-46).

The reference evaluates an XPath per record with registered namespaces and,
for each match, joins the non-blank descendant text nodes with single
spaces (or yields the attribute value).  Here the same evaluation compiles
to the built-in ``xpath()`` SQL function (javax.xml.xpath on the JVM —
whole-stage-codegen'd, no Python round trip), which returns the XPath
string-value of every matched node as ``array<string>``.

Namespace handling deviation (documented): Spark's ``xpath()`` has no
namespace-context registration, so prefixed name tests are rewritten to
``*[local-name()='name']`` predicates — matching by local name and ignoring
the namespace URI.  For real-world metadata vocabularies (oai_dc, MODS,
MARCXML) local names are unambiguous; exotic documents that reuse one local
name across namespaces would over-match relative to the reference.

Text-node deviation: Spark's ``xpath()`` yields node *values* (element
nodes have none), so element selections are rewritten to select their
descendant text nodes.  A matched element containing several text nodes
(mixed content / nested children) therefore emits one value per non-blank
text node, where the reference joins them with ``' '`` into one value per
match; for leaf metadata elements (oai_dc, MODS leaves — the common case)
the two are identical.  Values are whitespace-normalized (trim + collapse
runs), matching the reference's blank-skipping join.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_QNAME = re.compile(r"(@?)([A-Za-z_][\w.-]*):([A-Za-z_][\w.-]*)")


def localname_path(path: str, namespaces: dict | None = None) -> str:
    """Rewrite ``prefix:name`` steps to ``*[local-name()='name']`` form.

    Only prefixes present in ``namespaces`` are rewritten when a mapping is
    given (mirroring the reference's requirement that every prefix used be
    registered, lib/traject/nokogiri_reader.rb:153-169); with no mapping,
    every prefixed QName is rewritten.
    """

    def sub(m: re.Match) -> str:
        at, prefix, name = m.groups()
        if namespaces is not None and prefix not in namespaces:
            raise ValueError(
                f"xpath prefix {prefix!r} not registered in namespaces "
                f"{sorted(namespaces)}"
            )
        if at:
            return f"@*[local-name()='{name}']"
        return f"*[local-name()='{name}']"

    return _QNAME.sub(sub, path)


def _normalize(v: Column) -> Column:
    return F.trim(F.regexp_replace(v, r"\s+", " "))


def extract_xpath(
    path: str,
    ns: dict | None = None,
    to_text: bool = True,
    source_col: str | None = None,
):
    """Macro: evaluate ``path`` against the record's XML string; append the
    whitespace-normalized string-value of each non-blank match to the
    accumulator (nokogiri_macros.rb:13-46).

    ``to_text=False`` appends each matched node in its string form (the
    closest Spark analog of the reference's Nokogiri node objects — the
    engine exchanges strings, not DOM handles), by node kind exactly as
    the reference yields them (nokogiri_macros.rb:38-42):
    element steps -> the node re-serialized as an XML snippet;
    ``@attr`` steps -> the attribute's value;
    ``text()`` steps -> each direct text node's raw content.
    That path runs local-name matching in an Arrow-batched pandas UDF
    and supports the ``//[prefix:]name[/@attr|/text()]`` trailing-step
    form.
    """
    if not to_text:
        steps = [s for s in path.split("/") if s]
        raw_last = steps[-1].strip() if steps else ""
        # detect the @ BEFORE stripping a namespace prefix — '@dc:title'
        # splits to 'title' and would otherwise be misread as an element
        is_attr = raw_last.startswith("@")
        last = raw_last.lstrip("@").split(":")[-1].strip()
        if not last:
            raise ValueError(f"extract_xpath: empty xpath {path!r}")
        if is_attr or last == "text()":
            node_kind = "attr" if is_attr else "text"
            attr_name = last if is_attr else None
            elem = steps[-2].split(":")[-1].strip() if len(steps) > 1 else ""
            elem = None if elem in ("", "*") else elem
        else:
            node_kind, attr_name, elem = "element", None, last

        @pandas_udf("array<string>")
        def _nodes(col: pd.Series) -> pd.Series:
            import xml.etree.ElementTree as ET

            def localname(tag):
                return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""

            def one(text):
                if text is None:
                    return None
                try:
                    root = ET.fromstring(text)
                except ET.ParseError:
                    return []
                if node_kind == "element":
                    return [
                        ET.tostring(el, encoding="unicode")
                        for el in root.iter()
                        if localname(el.tag) == elem
                    ]
                hosts = [
                    el for el in root.iter()
                    if elem is None or localname(el.tag) == elem
                ]
                if node_kind == "attr":
                    out = []
                    for el in hosts:
                        for k, v in el.attrib.items():
                            if localname(k) == attr_name:
                                out.append(v)
                    return out
                # text(): direct child text nodes, raw (Nokogiri yields
                # Text nodes whose to_s is the unnormalized content)
                out = []
                for el in hosts:
                    if el.text is not None:
                        out.append(el.text)
                    for child in el:
                        if child.tail is not None:
                            out.append(child.tail)
                return out

            return col.map(one)

        def node_macro(acc: Column, ctx=None) -> Column:
            src = (
                F.col(source_col)
                if source_col
                else (ctx.record if ctx is not None else F.col("xml"))
            )
            return F.concat(acc, F.coalesce(_nodes(src), F.array()))

        return node_macro
    compiled = localname_path(path, ns)
    # element selections must target text nodes explicitly — xpath() returns
    # Node.getNodeValue(), which is null for elements (see module docstring).
    # The attribute check must ignore predicate content: an element step
    # like //subject[@authority='lcsh'] contains '@' but still selects
    # ELEMENTS and needs the text() rewrite.
    last_step = re.sub(r"\[[^\]]*\]", "", compiled.rsplit("/", 1)[-1])
    if not (last_step.endswith("text()") or last_step.startswith("@")):
        compiled += "/descendant-or-self::text()"

    def macro(acc: Column, ctx=None) -> Column:
        src = F.col(source_col) if source_col else (
            ctx.record if ctx is not None else F.col("xml")
        )
        vals = F.xpath(src, F.lit(compiled))
        vals = F.filter(
            F.transform(vals, _normalize),
            lambda x: x.isNotNull() & (x != ""),
        )
        return F.concat(acc, vals)

    return macro
