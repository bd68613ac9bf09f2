"""XML-mode record path (reference: lib/traject/nokogiri_reader.rb,
lib/traject/macros/nokogiri_macros.rb, lib/traject/oai_pmh_nokogiri_reader.rb).

A record is one XML string per DataFrame row (column ``xml``); pipelines use
``Pipeline(source_col="xml")`` with the :func:`extract_xpath` macro, which
compiles to Spark's built-in ``xpath()`` SQL function — JVM-side, no Python
in the hot path.
"""

from traject_spark.xmlrec.io import (
    harvest_oai_pmh,
    harvest_oai_pmh_restartable,
    read_xml_records,
)
from traject_spark.xmlrec.macros import extract_xpath, localname_path
from traject_spark.xmlrec.streaming_source import (
    OaiPmhDataSource,
    register_oaipmh,
)

__all__ = [
    "OaiPmhDataSource",
    "extract_xpath",
    "harvest_oai_pmh",
    "harvest_oai_pmh_restartable",
    "localname_path",
    "read_xml_records",
    "register_oaipmh",
]
