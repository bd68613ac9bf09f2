"""XML record sources (reference: lib/traject/nokogiri_reader.rb:61-177,
lib/traject/oai_pmh_nokogiri_reader.rb:28-164).

``read_xml_records`` is the NokogiriReader equivalent: each input file is
DOM-parsed and split into one row per element matching
``each_record_tag`` (the reference's ``nokogiri.each_record_xpath``,
nokogiri_reader.rb:101-114), re-serialized into its own XML string.  The
parse/split runs executor-side over Arrow batches (``mapInPandas``) so a
directory of many files splits in parallel; within one file the DOM parse
is sequential, exactly like the reference — feed many medium files, not
one giant one. Stdlib ElementTree only (no lxml dependency).

``harvest_oai_pmh`` follows ``resumptionToken`` pagination on the driver
(the protocol is inherently sequential, oai_pmh_nokogiri_reader.rb:72-99)
and returns the harvested records as a DataFrame for distributed mapping.
At scale the harvest is the bottleneck by design — the mapping of millions
of harvested records is where Spark parallelism applies.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = "xml string, input_name string, position_in_input long"


def _local(tag) -> str:
    """Strip the ``{uri}`` prefix ElementTree puts on namespaced tags."""
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _outermost_matches(root, match) -> list:
    """Depth-first collection of elements satisfying ``match`` WITHOUT
    descending into a matched element: a record whose metadata nests
    another element of the same local name (OAI <record> wrapping a
    MARCXML <record>) must yield ONE record, not two — the reference's
    namespace-qualified xpath gets this for free; local-name matching
    must take only the outermost."""
    if match(root):
        return [root]
    # explicit stack, not recursion: a pathologically deep document must
    # not hit the executor's Python recursion limit. Children are pushed
    # reversed so matches come out in document order.
    out = []
    stack = list(reversed(list(root)))
    while stack:
        el = stack.pop()
        if match(el):
            out.append(el)
            continue  # don't descend into a matched element
        stack.extend(reversed(list(el)))
    return out


def _split_parsed(root, each_record_tag: str) -> list[str]:
    matches = _outermost_matches(
        root,
        lambda el: _local(el.tag) == each_record_tag
        or el.tag == each_record_tag,
    )
    # re-root each match into its own document (nokogiri_reader.rb:101-114)
    return [ET.tostring(el, encoding="unicode") for el in matches]


def _split_doc(text: str, each_record_tag: Optional[str]) -> list[str]:
    if not each_record_tag:
        return [text]
    return _split_parsed(ET.fromstring(text), each_record_tag)


def _scrape(root, xpath: str, record_match=None) -> list[str]:
    """Match an ``//[ns:]tag``-style hook xpath by local element name and
    return the matched nodes' text (the useful subset of the reference's
    arbitrary-xpath hooks — resumption tokens, header counts).

    ``record_match`` (the per-record split predicate) scopes the scrape
    to nodes OUTSIDE matched record subtrees, honoring the documented
    contract (nokogiri_reader.rb:171-177 removes each record from the
    document before running the hooks): without it, a hook like
    ``//identifier`` on an OAI file would collect every per-record
    identifier into every row's clipboard."""
    tag = xpath.rsplit("/", 1)[-1].split(":")[-1].strip()
    out = []
    stack = [root]
    while stack:
        el = stack.pop()
        if record_match is not None and record_match(el):
            continue  # inside-record nodes are out of hook scope
        if _local(el.tag) == tag:
            out.append("".join(el.itertext()))
        stack.extend(reversed(list(el)))
    return out


def read_xml_records(
    spark: SparkSession,
    paths,
    each_record_tag: Optional[str] = None,
    extra_xpath_hooks: Optional[dict] = None,
) -> DataFrame:
    """One row per record element across all input files.

    ``each_record_tag`` matches by local name (namespace-agnostic, like the
    extract_xpath rewrite) or by full ``{uri}name``. ``None`` yields each
    whole document as one record (nokogiri_reader.rb default).
    Columns: ``xml``, ``input_name``, ``position_in_input`` (1-based within
    each file, mirroring Context#position_in_input, context.rb:24-28).

    ``extra_xpath_hooks`` ({name: xpath}) is the out-of-band scraping hook
    (nokogiri_reader.rb:171-177): nodes matched OUTSIDE the per-record
    split — e.g. an OAI-PMH ``resumptionToken`` — land in a ``clipboard``
    map<string,array<string>> column repeated on every record row of that
    file (the distributed analog of the reference's reader-level clipboard
    dict, which driver code can read back with one ``first()``). Nodes
    inside matched record subtrees are NOT scraped (with no
    ``each_record_tag`` the whole document is in scope). A file with
    hooks but ZERO record matches (e.g. a final OAI page carrying only a
    resumptionToken) still emits one clipboard-only row with ``xml`` NULL
    and ``position_in_input`` 0, so the scrape is always observable —
    filter ``xml IS NOT NULL`` for the records themselves.
    """
    raw = spark.read.text(paths, wholetext=True).select(
        F.col("value"), F.input_file_name().alias("input_name")
    )
    hooks = dict(extra_xpath_hooks or {})
    schema = RECORD_SCHEMA + (
        ", clipboard map<string,array<string>>" if hooks else ""
    )

    def gen(batches):
        import pandas as pd

        from traject_spark.arrowutil import batched_rows

        # bounded output batches (r12, same fix as read_iso2709): the
        # splitter used to yield one batch per input batch of WHOLE
        # FILES, so a single million-record XML file materialized every
        # split string in one pandas batch before Arrow conversion
        cols = ["xml", "input_name", "position_in_input"]
        if hooks:
            cols.append("clipboard")

        def rows():
          for pdf in batches:
            for text, name in zip(pdf["value"], pdf["input_name"]):
                clip = None
                if hooks:
                    # ONE DOM parse per file feeds both the clipboard
                    # scrape and the record split (the parse dominates
                    # per-file cost; parsing twice doubled executor CPU
                    # on the hooks+split path OAI reading uses)
                    root = ET.fromstring(text)
                    record_match = (
                        (
                            lambda el: _local(el.tag) == each_record_tag
                            or el.tag == each_record_tag
                        )
                        if each_record_tag
                        else None
                    )
                    clip = {
                        k: _scrape(root, xp, record_match)
                        for k, xp in hooks.items()
                    }
                    splits = (
                        _split_parsed(root, each_record_tag)
                        if each_record_tag
                        else [text]
                    )
                    if not splits:
                        # zero record matches (final OAI page carrying
                        # only a token): a clipboard-only row keeps the
                        # scrape observable via first()
                        yield (None, name, 0, clip)
                else:
                    splits = _split_doc(text, each_record_tag)
                for i, xml in enumerate(splits):
                    row = (xml, name, i + 1)
                    yield row + (clip,) if hooks else row

        yield from batched_rows(
            rows(), lambda buf: pd.DataFrame(buf, columns=cols)
        )

    return raw.mapInPandas(gen, schema)


def _default_fetch(url: str) -> str:
    import urllib.request

    with urllib.request.urlopen(url, timeout=60) as resp:  # noqa: S310
        return resp.read().decode("utf-8", errors="replace")


class OaiPmhError(RuntimeError):
    """An OAI-PMH protocol ``<error>`` response (badResumptionToken,
    badArgument, ...). The protocol returns these as HTTP 200 + an
    ``<error>`` element; the reference reader loops blindly past them and
    stops as if the harvest completed (oai_pmh_nokogiri_reader.rb:72-99
    has no error check) — a DELIBERATE deviation here, because a silent
    partial harvest is indistinguishable from a complete one, and the
    restartable variant would durably commit the bogus done state."""


def _effective_verb(base_url: str, verb: str) -> str:
    """The verb actually in play: a query-bearing ``base_url`` (reference
    ``oai_pmh.start_url`` parity — taken verbatim for page 1,
    oai_pmh_nokogiri_reader.rb:12-17,53-60) may carry its own ``verb``,
    which wins over the keyword default so record_tag and
    resumptionToken parsing follow the URL, like the reference's
    ``start_url_verb``."""
    import urllib.parse

    if "?" in base_url:
        q = urllib.parse.parse_qs(urllib.parse.urlsplit(base_url).query)
        if q.get("verb"):
            return q["verb"][0]
    return verb


def _fetch_oai_page(
    fetch: Callable[[str], str],
    base_url: str,
    verb: str,
    token: Optional[str],
    metadata_prefix: str,
    set_spec: Optional[str],
    record_tag: str,
    from_date: Optional[str] = None,
    until_date: Optional[str] = None,
    extra_params: Optional[dict] = None,
) -> tuple[list[str], Optional[str]]:
    """Fetch + parse one OAI-PMH page -> (record XML strings, next token).

    Selective-harvest args (r13 verdict #2): ``from_date`` /
    ``until_date`` are OAI datestamps (``YYYY-MM-DD`` or full UTC
    timestamp, server-granularity — passed verbatim as the protocol's
    ``from``/``until``); ``extra_params`` is a raw passthrough dict for
    anything else the endpoint understands. Per the protocol, ALL of
    these ride ONLY on the initial request — a resumptionToken request
    carries exclusively the verb + token (the token encodes the window).

    ``base_url`` may carry its own query string (reference
    ``oai_pmh.start_url`` parity): page 1 then fetches it VERBATIM and
    token pages use the bare path + verb + token, exactly the
    reference's ``resumption_url`` (oai_pmh_nokogiri_reader.rb:94-102).

    Raises :class:`OaiPmhError` on a protocol error element, and on a
    server that returns the SAME resumptionToken it was sent (the loop
    would otherwise refetch that page forever)."""
    import urllib.parse

    verb = _effective_verb(base_url, verb)
    if "?" in base_url:
        if from_date or until_date or extra_params or set_spec:
            # a verbatim start_url and keyword window params cannot be
            # merged safely (whose metadataPrefix wins? is `from`
            # duplicated?) — and silently IGNORING the window would
            # make a nightly incremental job re-harvest the whole
            # repository while the restartable checkpoint durably
            # claims the window was applied. Refuse loudly.
            raise OaiPmhError(
                "base_url carries its own query string (start_url "
                "mode, fetched verbatim) — put from/until/set/extra "
                "params IN the URL, or pass a bare endpoint with the "
                "keyword arguments; mixing both would silently drop "
                f"the keywords (url={base_url!r})"
            )
        path = base_url.split("?", 1)[0]
        if token:
            url = path + "?" + urllib.parse.urlencode(
                {"verb": verb, "resumptionToken": token}
            )
        else:
            url = base_url  # start_url taken verbatim (reference parity)
    else:
        params = {"verb": verb}
        if token:
            # token-only request per the protocol (reference :60-70)
            params["resumptionToken"] = token
        else:
            params["metadataPrefix"] = metadata_prefix
            if set_spec:
                params["set"] = set_spec
            if from_date:
                params["from"] = from_date
            if until_date:
                params["until"] = until_date
            if extra_params:
                params.update(extra_params)
        url = base_url + "?" + urllib.parse.urlencode(params)
    page_xml = fetch(url)
    root = ET.fromstring(page_xml)
    # direct children only: a harvested record's METADATA may legally
    # contain an <error> element of some other vocabulary
    for child in root:
        if _local(child.tag) == "error":
            raise OaiPmhError(
                f"OAI-PMH error {child.get('code', '?')!r}: "
                f"{(child.text or '').strip()}"
            )
    records = [
        ET.tostring(el, encoding="unicode")
        for el in _outermost_matches(
            root, lambda el: _local(el.tag) == record_tag
        )
    ]
    # the protocol puts resumptionToken as a DIRECT child of the verb
    # element — scanning the whole document would let a token-like
    # element embedded in a harvested record's metadata/about hijack
    # (or, if empty, silently terminate) the pagination
    verb_el = next((c for c in root if _local(c.tag) == verb), None)
    next_token = (
        next(
            (
                (el.text or "").strip()
                for el in verb_el
                if _local(el.tag) == "resumptionToken"
            ),
            "",
        )
        if verb_el is not None
        else ""
    ) or None
    if next_token is not None and next_token == token:
        raise OaiPmhError(
            f"server repeated resumptionToken {token!r}; aborting instead "
            "of refetching the same page forever"
        )
    return records, next_token


def harvest_oai_pmh(
    spark: SparkSession,
    base_url: str,
    metadata_prefix: str = "oai_dc",
    set_spec: Optional[str] = None,
    verb: str = "ListRecords",
    fetch: Optional[Callable[[str], str]] = None,
    max_pages: Optional[int] = None,
    from_date: Optional[str] = None,
    until_date: Optional[str] = None,
    extra_params: Optional[dict] = None,
) -> DataFrame:
    """Harvest an OAI-PMH endpoint into a DataFrame of record XML strings.

    Follows ``resumptionToken`` until exhausted
    (oai_pmh_nokogiri_reader.rb:72-99); ``fetch`` is injectable for tests
    and for custom HTTP (auth, retry, gzip — the reference's persistent
    HTTP adapter concerns live there). Returns columns ``xml``,
    ``position`` (1-based harvest order). Raises :class:`OaiPmhError` on
    a protocol ``<error>`` response or a repeated token (see the class
    docstring for why this deviates from the reference's silent stop).

    Selective (incremental) harvest: ``from_date``/``until_date`` are OAI
    datestamps for the protocol's ``from``/``until`` window — THE nightly
    production pattern — and ``extra_params`` passes anything else
    verbatim; all ride only on the initial request (token requests are
    token-only per the protocol). Alternatively pass a query-bearing
    ``base_url`` and it is taken verbatim for page 1, reference
    ``oai_pmh.start_url`` parity (see :func:`_fetch_oai_page`).

    MEMORY BOUND: this convenience variant accumulates the whole harvest
    in a driver-side list before ``createDataFrame`` — fine for tests and
    small-to-medium harvests (up to roughly ``max_pages`` x page size
    records in driver memory). Large or interruptible harvests should use
    :func:`harvest_oai_pmh_restartable`, which streams each page straight
    to an append parquet sink and checkpoints the resumption token.
    """
    fetch = fetch or _default_fetch
    record_tag = (
        "record" if _effective_verb(base_url, verb) == "ListRecords"
        else "header"
    )
    records: list[str] = []
    token: Optional[str] = None
    pages = 0
    while True:
        page_records, token = _fetch_oai_page(
            fetch, base_url, verb, token, metadata_prefix, set_spec,
            record_tag, from_date, until_date, extra_params,
        )
        records.extend(page_records)
        pages += 1
        if token is None or (max_pages is not None and pages >= max_pages):
            break
    return spark.createDataFrame(
        [(xml, i + 1) for i, xml in enumerate(records)],
        "xml string, position long",
    )


def harvest_oai_pmh_restartable(
    spark: SparkSession,
    base_url: str,
    output_path: str,
    checkpoint_path: str,
    metadata_prefix: str = "oai_dc",
    set_spec: Optional[str] = None,
    verb: str = "ListRecords",
    fetch: Optional[Callable[[str], str]] = None,
    max_pages: Optional[int] = None,
    from_date: Optional[str] = None,
    until_date: Optional[str] = None,
    extra_params: Optional[dict] = None,
) -> DataFrame:
    """Restartable OAI-PMH harvest: resumption-token checkpointing in the
    Structured-Streaming mold (offset log + append sink).

    Selective harvest (r13 verdict #2): ``from_date``/``until_date``/
    ``extra_params`` scope the initial request exactly as in
    :func:`harvest_oai_pmh`. The checkpoint additionally records the
    request SIGNATURE (url/prefix/set/window): a resumptionToken only
    means something relative to the request that minted it, so resuming
    a checkpoint under a DIFFERENT window would silently continue the
    old window while claiming the new one — that mismatch raises
    loudly instead. One incremental window = one checkpoint_path; the
    append ``output_path`` may be shared across windows (nightly
    harvests accumulate into one corpus).

    The protocol is inherently sequential driver-side pagination
    (oai_pmh_nokogiri_reader.rb:72-99), but a 10M-record harvest must
    survive interruption: each page's records APPEND to ``output_path``
    as parquet, then the page's resumption token commits atomically to
    ``checkpoint_path`` (temp file + rename — the offset-log pattern).
    A re-invocation resumes from the committed token instead of page 1.
    Delivery is at-least-once at page granularity (a crash between sink
    append and token commit re-appends that page); harvested records
    carry their OAI identifier, so downstream exact dedup on it restores
    exactly-once. Returns the DataFrame over everything harvested so far.

    Done state: token committed as '' — further calls fetch nothing.
    """
    import json as _json
    import os

    fetch = fetch or _default_fetch
    record_tag = (
        "record" if _effective_verb(base_url, verb) == "ListRecords"
        else "header"
    )
    ckpt_file = os.path.join(checkpoint_path, "oai_offset.json")
    os.makedirs(checkpoint_path, exist_ok=True)

    signature = {
        "url": base_url, "prefix": metadata_prefix, "set": set_spec,
        "verb": verb, "from": from_date, "until": until_date,
        "extra": sorted((extra_params or {}).items()),
    }
    token: Optional[str] = None
    page = 0
    done = False
    if os.path.exists(ckpt_file):
        with open(ckpt_file, "r", encoding="utf-8") as fh:
            state = _json.load(fh)
        # older checkpoints (pre-signature) carry no request signature;
        # treat them as matching rather than breaking an in-flight harvest
        committed_sig = state.get("signature")
        if committed_sig is not None and committed_sig != _json.loads(
            _json.dumps(signature)
        ):
            raise OaiPmhError(
                "checkpoint at "
                f"{checkpoint_path!r} was committed for a different "
                f"request (committed {committed_sig!r}, requested "
                f"{signature!r}); a resumptionToken is only meaningful "
                "for the request that minted it — use a fresh "
                "checkpoint_path per harvest window"
            )
        token, page = state["token"] or None, state["page"]
        done = state["token"] == ""

    def commit(tok: Optional[str], pg: int) -> None:
        tmp = ckpt_file + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            _json.dump(
                {
                    "token": tok if tok is not None else "",
                    "page": pg,
                    "signature": signature,
                },
                fh,
            )
        os.replace(tmp, ckpt_file)  # atomic on POSIX

    pages_this_run = 0
    while not done:
        # an OaiPmhError here (protocol error / repeated token) raises
        # BEFORE commit, so the previously committed token survives and a
        # later invocation retries that page — the done state can only be
        # committed by a genuinely token-less successful page
        records, token = _fetch_oai_page(
            fetch, base_url, verb, token, metadata_prefix, set_spec,
            record_tag, from_date, until_date, extra_params,
        )
        page += 1
        if records:
            spark.createDataFrame(
                [(xml, page, i + 1) for i, xml in enumerate(records)],
                "xml string, page long, position_in_page long",
            ).write.mode("append").parquet(output_path)
        commit(token, page)
        done = token is None
        pages_this_run += 1
        if max_pages is not None and pages_this_run >= max_pages:
            break
    # the shared base class: common ancestor of both the classic
    # captured variant and the Spark Connect variant, so the
    # zero-records-harvested case is recognized under either runtime
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(output_path)
    except AnalysisException:
        # zero records harvested so far -> the sink path was never
        # written; return an empty frame of the sink schema. Other read
        # failures (permissions, corrupt footer) propagate — millions of
        # already-harvested records must not masquerade as zero.
        return spark.createDataFrame(
            [], "xml string, page long, position_in_page long"
        )
