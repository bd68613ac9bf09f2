"""OAI-PMH as a first-class Spark data source (batch + streaming).

SURVEY §7 stretch goal, completing the OAI-PMH story: beyond the
driver-side harvesters in ``xmlrec.io`` (one-shot ``harvest_oai_pmh``
and the token-checkpointing ``harvest_oai_pmh_restartable``), this
registers ``format("oaipmh")`` on the Spark 4 Python Data Source API so
a harvest IS a query:

    from traject_spark.xmlrec.streaming_source import register_oaipmh
    register_oaipmh(spark)
    stream = (spark.readStream.format("oaipmh")
              .option("url", "https://example.org/oai")
              .option("metadataPrefix", "oai_dc")
              .load())
    # -> pipeline.apply(...) -> writeStream/foreachBatch, with Spark's
    #    own offset log checkpointing the resumption token

Design notes (the scale story):

- OAI-PMH is an inherently SEQUENTIAL driver-side pagination protocol
  (each page's resumptionToken gates the next), so the reader is a
  ``SimpleDataSourceStreamReader`` — reads happen on the driver, one
  page per micro-batch, and Spark's offset log persists
  ``{"token": ..., "page": N}``. A restarted query resumes from the
  committed token; no state of ours lives outside the checkpoint.
- Trigger semantics: use a processing-time (or default) trigger — the
  query drains page-per-micro-batch until the chain is exhausted, then
  idles (the done offset stops advancing). ``availableNow`` snapshots
  only the prefetched page (the chain's length is unknown up front);
  repeated ``availableNow`` runs against one checkpoint DO advance the
  harvest a page at a time — a valid cron shape — but draining in one
  run wants the continuous trigger, and a one-shot batch drain is
  ``spark.read.format("oaipmh")``.
- Replay (``readBetweenOffsets``) refetches the page for the recorded
  start token. OAI servers MAY expire tokens; an expired replay raises
  (loudly) rather than silently skipping — delivery is therefore
  at-least-once at page granularity, and records carry their OAI
  ``identifier`` so downstream exact dedup restores exactly-once
  (the same contract as ``harvest_oai_pmh_restartable``).
- The batch path (``spark.read.format("oaipmh")``) drains the full
  token chain in one job — one partition, because the protocol offers
  no random access; fan-out happens AFTER ingest via repartition.
- Protocol ``<error>`` responses raise :class:`~traject_spark.xmlrec.io.
  OaiPmhError` through the shared ``_fetch_oai_page`` (a silent partial
  harvest is indistinguishable from a complete one; see its docstring
  for why this deviates from the reference reader,
  oai_pmh_nokogiri_reader.rb:72-99).

Options: ``url`` (required; may carry a verbatim query string —
reference ``oai_pmh.start_url`` parity), ``metadataPrefix`` (default
``oai_dc``), ``set`` (optional setSpec), ``verb`` (``ListRecords``
default, or ``ListIdentifiers``), ``from``/``until`` (OAI datestamps —
selective/incremental harvest window, initial request only), ``maxPages``
(optional int cap, mostly for tests/smoke harvests).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator, Optional, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "xml string, identifier string, datestamp string, "
    "page long, position_in_page long"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _header_fields(record_xml: str) -> tuple[Optional[str], Optional[str]]:
    """(identifier, datestamp) from a record/header element; None-safe on
    malformed fragments (the xml column still carries the raw record)."""
    try:
        el = ET.fromstring(record_xml)
    except ET.ParseError:
        return None, None
    header = el if _local(el.tag) == "header" else next(
        (c for c in el.iter() if _local(c.tag) == "header"), None
    )
    if header is None:
        return None, None
    ident = next(
        ((c.text or "").strip() for c in header
         if _local(c.tag) == "identifier"), None
    )
    stamp = next(
        ((c.text or "").strip() for c in header
         if _local(c.tag) == "datestamp"), None
    )
    return ident, stamp


class _Options:
    """Validated option bundle; options dict keys arrive lowercased."""

    def __init__(self, options: dict):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("oaipmh source requires .option('url', ...)")
        self.metadata_prefix = options.get("metadataprefix", "oai_dc")
        self.set_spec = options.get("set")
        self.verb = options.get("verb", "ListRecords")
        if self.verb not in ("ListRecords", "ListIdentifiers"):
            raise ValueError(
                f"verb must be ListRecords or ListIdentifiers, got "
                f"{self.verb!r}"
            )
        mp = options.get("maxpages")
        self.max_pages = int(mp) if mp is not None else None
        # selective harvest window (r13 verdict #2): OAI `from`/`until`
        # datestamps, initial request only (token requests stay
        # token-only); a query-bearing url is honored verbatim for page 1
        # (reference oai_pmh.start_url parity) via _fetch_oai_page
        self.from_date = options.get("from")
        self.until_date = options.get("until")
        from traject_spark.xmlrec.io import _effective_verb

        self.record_tag = (
            "record"
            if _effective_verb(self.url, self.verb) == "ListRecords"
            else "header"
        )

    def fetch_page(self, token: Optional[str]):
        from traject_spark.xmlrec.io import _default_fetch, _fetch_oai_page

        return _fetch_oai_page(
            _default_fetch, self.url, self.verb, token,
            self.metadata_prefix, self.set_spec, self.record_tag,
            self.from_date, self.until_date,
        )


def _page_rows(records: list, page: int) -> list:
    return [
        (xml, *_header_fields(xml), page, i + 1)
        for i, xml in enumerate(records)
    ]


class _OaiPmhStreamReader(SimpleDataSourceStreamReader):
    """One OAI page per micro-batch; the resumption token IS the offset."""

    def __init__(self, options: dict):
        self.opts = _Options(options)

    def initialOffset(self) -> dict:
        return {"token": "", "page": 0, "done": False}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        if start.get("done") or (
            self.opts.max_pages is not None
            and start["page"] >= self.opts.max_pages
        ):
            return iter([]), start
        token = start.get("token") or None
        records, next_token = self.opts.fetch_page(token)
        page = start["page"] + 1
        end = {
            "token": next_token or "",
            "page": page,
            "done": next_token is None,
        }
        return iter(_page_rows(records, page)), end

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # replay after restart: refetch the page start's token addressed.
        # An expired token raises through _fetch_oai_page — loud
        # at-least-once, never a silent gap.
        if start.get("done") or start == end:
            return iter([])
        token = start.get("token") or None
        records, _ = self.opts.fetch_page(token)
        return iter(_page_rows(records, start["page"] + 1))

    def commit(self, end: dict) -> None:
        pass  # the offset log is the only state


class _OaiPmhBatchReader(DataSourceReader):
    """Drain the whole token chain in one sequential partition."""

    def __init__(self, options: dict):
        self.opts = _Options(options)

    def read(self, partition) -> Iterator[tuple]:
        token: Optional[str] = None
        page = 0
        while True:
            records, token = self.opts.fetch_page(token)
            page += 1
            yield from _page_rows(records, page)
            if token is None or (
                self.opts.max_pages is not None
                and page >= self.opts.max_pages
            ):
                return


class OaiPmhDataSource(DataSource):
    """``format("oaipmh")``: see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "oaipmh"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _OaiPmhBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _OaiPmhStreamReader(self.options)


def register_oaipmh(spark) -> None:
    """Register ``format("oaipmh")`` on this session (idempotent)."""
    spark.dataSource.register(OaiPmhDataSource)
