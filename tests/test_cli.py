"""CLI tests — the behavioral port of the reference's command-line surface
(lib/traject/command_line.rb): -c config, -t type, -w writer, -o output,
marcout, commit, after_processing ordering."""

import json
import os

import pytest

MC = "/root/reference/test/test_support/manufacturing_consent.marc"


CONFIG = """
settings(mapping_rescue="halt")
to_field("title", extract_marc("245ab", trim_punctuation=True))
to_field("lang", extract_marc("008[35-37]"))
after_processing(lambda: open({marker!r}, "w").write("done"))
"""


def run_cli(spark, argv):
    from traject_spark.cli import main

    return main(argv, spark=spark)


def test_cli_process_ndjson(spark, tmp_path):
    marker = str(tmp_path / "after.txt")
    conf = tmp_path / "config.py"
    conf.write_text(CONFIG.format(marker=marker))
    out = str(tmp_path / "out")
    rc = run_cli(
        spark, ["-c", str(conf), "-o", out, "-w", "json", MC]
    )
    assert rc == 0
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            with open(os.path.join(out, f)) as fh:
                lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(lines) == 1
    assert lines[0]["title"] == [
        "Manufacturing consent : the political economy of the mass media"
    ]
    assert lines[0]["lang"] == ["eng"]
    # after_processing ran after the write (indexer.rb:646-655)
    assert open(marker).read() == "done"


def test_cli_requires_config(spark):
    with pytest.raises(SystemExit):
        run_cli(spark, [MC])


def test_cli_bad_setting_arg(spark):
    with pytest.raises(SystemExit):
        run_cli(spark, ["-c", "x.py", "-s", "noequals", MC])


def test_cli_marcout_json_roundtrip(spark, tmp_path):
    from traject_spark.marc.serialize import from_marc_in_json

    out = str(tmp_path / "marcout")
    rc = run_cli(
        spark,
        ["-x", "marcout", "-s", "marcout.type=json", "-o", out, MC],
    )
    assert rc == 0
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            lines += [
                ln for ln in open(os.path.join(out, f)) if ln.strip()
            ]
    assert len(lines) == 1
    rec = from_marc_in_json(lines[0])
    assert any(
        cf["value"] == "2710183"
        for cf in rec["controlfields"]
        if cf["tag"] == "001"
    )


def test_cli_marcout_reads_config_file_settings(spark, tmp_path):
    """-x marcout must load -c config files first (command_line.rb:273-274
    initialize_indexer!), so marcout.type/output_file provided there apply."""
    from traject_spark.marc.serialize import from_marc_in_json

    out = str(tmp_path / "marcout_conf")
    conf = tmp_path / "marcout.py"
    conf.write_text(
        "provide('marcout.type', 'json')\n"
        f"provide('output_file', {out!r})\n"
    )
    rc = run_cli(spark, ["-x", "marcout", "-c", str(conf), MC])
    assert rc == 0
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            lines += [ln for ln in open(os.path.join(out, f)) if ln.strip()]
    assert len(lines) == 1
    assert from_marc_in_json(lines[0])["controlfields"]


def test_cli_commit_posts_to_solr(monkeypatch):
    import http.server
    import threading

    hits = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'{"status":0}')

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from traject_spark.cli import main

        rc = main(
            ["-x", "commit", "-u",
             f"http://127.0.0.1:{srv.server_address[1]}/solr/core"]
        )
        assert rc == 0
        assert hits == ["/solr/core/update?commit=true"]
    finally:
        srv.shutdown()


XML_CONFIG = """
to_field("title", extract_xpath("//dc:title",
         ns={"dc": "http://purl.org/dc/elements/1.1/"}))
to_field("creator", extract_xpath("//dc:creator",
         ns={"dc": "http://purl.org/dc/elements/1.1/"}))
"""


def test_cli_xml_indexer_oai_sample(spark, tmp_path):
    """-i xml + nokogiri.each_record_xpath over the reference's OAI
    sample — the NokogiriIndexer CLI flavor."""
    conf = tmp_path / "xml_config.py"
    conf.write_text(XML_CONFIG)
    out = str(tmp_path / "out")
    rc = run_cli(
        spark,
        ["-c", str(conf), "-i", "xml",
         "-s", "nokogiri.each_record_xpath=//oai:record",
         "-o", out, "-w", "json",
         "/root/reference/test/test_support/sample-oai-pmh.xml"],
    )
    assert rc == 0
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            with open(os.path.join(out, f)) as fh:
                lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(lines) > 1
    assert any("title" in d for d in lines)


def test_cli_boolean_settings_and_csv_writer(spark, tmp_path):
    """-s key=false coerces to a real boolean (the string 'false' is
    truthy and would invert the setting); -w csv works without a
    delimited_writer.fields setting (defaults to all output columns)
    and accepts a Ruby-style qualified writer name."""
    conf = tmp_path / "c.py"
    conf.write_text('to_field("title", extract_marc("245a"))\n')
    out = str(tmp_path / "csvout")
    rc = run_cli(
        spark,
        ["-c", str(conf), "-o", out,
         "-s", "writer_class_name=Traject::CSVWriter",
         "-s", "allow_nil_values=false", MC],
    )
    assert rc == 0
    body = ""
    for f in os.listdir(out):
        if f.startswith("part-"):
            body += open(os.path.join(out, f)).read()
    assert "Manufacturing consent" in body

    # csv without -o is an explicit error, not silent JSON
    import pytest
    with pytest.raises(SystemExit):
        run_cli(spark, ["-c", str(conf), "-w", "csv", MC])


def test_xml_record_split_takes_outermost_match(spark, tmp_path):
    """An OAI <record> wrapping a MARCXML <record> is ONE record."""
    from traject_spark.xmlrec.io import read_xml_records

    doc = (
        "<OAI><ListRecords>"
        "<record><header><identifier>o1</identifier></header>"
        '<metadata><record xmlns="http://www.loc.gov/MARC21/slim">'
        "<leader>x</leader></record></metadata></record>"
        "</ListRecords></OAI>"
    )
    p = tmp_path / "oai.xml"
    p.write_text(doc)
    rows = read_xml_records(spark, str(p), each_record_tag="record").collect()
    assert len(rows) == 1
    assert "identifier" in rows[0]["xml"]  # the OUTER record, whole
