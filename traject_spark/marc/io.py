"""MARC ingest sources -> the canonical nested-struct DataFrame.

Three input formats, mirroring the reference's MarcReader modes
(lib/traject/marc_reader.rb:54-90) and NDJReader (lib/traject/ndj_reader.rb);
record-level parsing/serialization lives in traject_spark.marc.serialize —
this module only binds it to Spark sources.

- ``read_marc_json``: newline-delimited marc-in-json. Gzip is transparent
  (Spark text source). Malformed lines are skipped, like the reference's
  per-line rescue (ndj_reader.rb:30-34).
- ``read_iso2709``: binary MARC (ISO 2709, public spec) via the
  binaryFile source + per-file stream split.
- ``read_marcxml``: MARCXML via streaming ``xml.etree`` iterparse over
  raw file bytes (O(record) memory, transparent in-Python gunzip);
  record elements located namespace-agnostically.

All three distribute at file granularity for ordinary files; oversized
LOCAL files byte-range split (``read_iso2709`` on the 0x1D terminator,
``read_marcxml`` on ``<record`` start-tag resync). For 100 TB ingest,
store many moderate files — or convert once to parquet of the nested
struct (the preferred long-term layout: nested-schema pruning at the
scan; ``traject-spark convert``).

All three parse inside ``mapInArrow`` — Arrow-batched column transfer
into Python and back, no per-row pickling (the row-at-a-time
``rdd.mapPartitions`` shape this replaced serializes every record twice
through the Python pickler and was the first ingest bottleneck at scale).
The OUTPUT side builds ``pyarrow.RecordBatch`` objects directly
(``_marc_batches``): the previous ``mapInPandas`` emission paid Spark's
pandas-Series-to-Arrow conversion on the nested struct column, measured
at ~2x the whole remaining lane cost on the 600k-record NDJSON bench
(isolated A/B, tools/ab_ingest_r15.py: mapInPandas 4.55s vs direct
RecordBatches 2.41s min) — ``pa.array(list_of_dicts, type=struct)`` is
one C-path conversion, per guide §4.1/§4.2 (r15 optimization round).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from traject_spark.marc.schema import MARC_SOURCE_SCHEMA
from traject_spark.marc.serialize import (
    CONTROL_TAGS,
    from_iso2709,
    from_marc_in_json,
    split_iso2709_stream,
)


def _id_from(rec: dict, id_tag: str) -> Optional[str]:
    for cf in rec["controlfields"]:
        if cf["tag"] == id_tag:
            return cf["value"]
    return None


#: executor-side cache of the Arrow type for MARC_SOURCE_SCHEMA['marc']
#: (module-level so a reused Python worker converts it once, guide §4.5)
_MARC_ARROW_TYPE = None


def _marc_batches(rows: Iterator) -> Iterator:
    """(record_id, marc_dict) iterator -> bounded pyarrow RecordBatches.

    The shared OUTPUT path of every MARC reader (r15): builds the
    (record_id, marc) batches directly with ``pa.array(..., type=...)``
    instead of routing Python dicts through a pandas object column —
    Spark's pandas→Arrow conversion of a nested struct Series was ~2x
    the cost of the entire remaining lane (see module docstring; A/B in
    tools/ab_ingest_r15.py). Batch bounding (rows per batch) and the
    yield-nothing-for-empty-input policy are unchanged — both come from
    ``batched_rows``.
    """
    import pyarrow as pa

    from traject_spark.arrowutil import batched_rows

    global _MARC_ARROW_TYPE
    if _MARC_ARROW_TYPE is None:
        from pyspark.sql.pandas.types import to_arrow_type

        _MARC_ARROW_TYPE = to_arrow_type(MARC_SOURCE_SCHEMA["marc"].dataType)

    def to_batch(buf):
        return pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in buf], type=pa.string()),
                pa.array([r[1] for r in buf], type=_MARC_ARROW_TYPE),
            ],
            names=["record_id", "marc"],
        )

    return batched_rows(rows, to_batch)


def read_marc_json(
    spark: SparkSession, paths, id_tag: str = "001", engine: str = "python"
) -> DataFrame:
    """NDJSON of marc-in-json (ndj_reader.rb:9-38). Bad lines skipped.

    ``engine='python'`` (default): Arrow-batched ``mapInPandas`` parse —
    CPython's C json parser over whole batches, measured ~25% faster
    than the variant path at 600k records (4.3s vs 5.8s).

    ``engine='jvm'``: the whole parse as JVM-side VARIANT algebra —
    ``try_parse_json`` + ``try_variant_get`` casts, no Python workers at
    all (marc-in-json's dynamic tag keys make a plain ``from_json``
    schema impossible, but each field object casts cleanly to
    ``map<string,variant>``). Same per-line rescue semantics, verified
    by full-struct parity tests; choose it where provisioning Python on
    executors is the constraint rather than raw parse throughput.
    """
    return _parse_marc_json_lines(spark.read.text(paths), id_tag, engine)


def read_marc_json_stream(
    spark: SparkSession,
    paths,
    id_tag: str = "001",
    engine: str = "python",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_marc_json`: a streaming
    text source over an NDJSON directory, the same per-line-rescue parse
    (both engines), the same (record_id, marc) schema. Compose with any
    pipeline and a ``foreachBatch`` sink (see
    ``streaming.stream_marc_to_solr`` for the flagship wiring);
    ``max_files_per_trigger`` bounds micro-batch size for steady-state
    ingest of a growing drop directory."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _parse_marc_json_lines(reader.text(paths), id_tag, engine)


def _parse_marc_json_lines(
    lines: DataFrame, id_tag: str, engine: str
) -> DataFrame:
    if engine not in ("jvm", "python"):
        # a typo ('JVM', 'jmv') must not silently take the Python path —
        # on a cluster chosen for the jvm engine because executors have
        # no Python, that surfaces as an opaque worker-startup failure
        raise ValueError(
            f"engine must be 'jvm' or 'python', got {engine!r}"
        )
    if engine == "jvm":
        return _read_marc_json_jvm(lines, id_tag)

    def parse(batches: Iterator) -> Iterator:
        def rows():
            for batch in batches:
                for line in batch.column(0).to_pylist():
                    if not line or not line.strip():
                        continue
                    try:
                        rec = from_marc_in_json(line)
                    except (
                        json.JSONDecodeError,
                        AttributeError,
                        TypeError,
                        KeyError,
                        ValueError,
                    ):
                        continue  # per-line rescue, ndj_reader.rb:30-34
                    yield (_id_from(rec, id_tag), rec)

        yield from _marc_batches(rows())

    return lines.mapInArrow(parse, MARC_SOURCE_SCHEMA)


def _read_marc_json_jvm(lines: DataFrame, id_tag: str) -> DataFrame:
    """JVM-only marc-in-json parse (see read_marc_json docstring).

    Evaluation discipline: every multiply-referenced piece (the parsed
    variant, the field-entry array, each field body) is ``let``-bound so
    it evaluates ONCE per row, and the bad-line filter is an
    ``explode`` of a 0/1-element array built in the SAME projection —
    a Column-level filter on a separate operator would let Catalyst's
    projection collapse duplicate the whole parse per reference."""
    from pyspark.sql import functions as F

    from traject_spark.expr import let, let2

    def entries_of(obj: "F.Column"):
        # variant object -> array<struct<key,value:variant>>; null when
        # the cast fails (entry is not an object)
        return F.map_entries(F.try_variant_get(obj, "$", "map<string,variant>"))

    def body_str(val):
        return F.try_variant_get(val, "$", "string")

    def ind_expr(body, path):
        # MISSING indicator key -> " " (the Python engine's
        # body.get("ind1", " ") default); an EXPLICIT JSON null stays
        # NULL, matching _scalar_str(None) and ruby-marc keeping an
        # explicitly-passed nil — coalescing the string cast could not
        # tell the two apart and silently rewrote null to " "
        return let(
            F.try_variant_get(body, path, "variant"),
            lambda iv: F.when(iv.isNull(), F.lit(" "))
            .when(F.is_variant_null(iv), F.lit(None).cast("string"))
            .otherwise(body_str(iv)),
        )

    def subfield_structs(body):
        # a non-object subfield entry nulls the flatten -> null subfields
        # -> the whole LINE drops (validity check below), matching the
        # Python path's AttributeError rescue; a MISSING or non-array
        # "subfields" key also drops (ruby: field['subfields'].each on
        # nil raises NoMethodError into the same rescue) — the try cast
        # returns null for both, which propagates to null subfields
        pairs = F.flatten(
            F.transform(
                F.try_variant_get(body, "$.subfields", "array<variant>"),
                entries_of,
            )
        )
        return F.transform(
            pairs,
            lambda p: F.struct(
                p["key"].alias("code"), body_str(p["value"]).alias("value")
            ),
        )

    def record_from_entries(v, raw_entries):
        # classify each entry ONCE, let-bound: schema_of_variant builds a
        # schema string per call, so letting the classified array appear
        # twice (control filter + data filter) would re-evaluate it
        return let(
            F.transform(
                raw_entries,
                lambda e: F.struct(
                    e["key"].alias("key"),
                    e["value"].alias("value"),
                    F.coalesce(
                        F.substring(F.schema_of_variant(e["value"]), 1, 1),
                        F.lit("V"),
                    ).alias("k"),
                ),
            ),
            lambda entries: _record_from_classified(v, entries),
        )

    # ruby-marc's default control-tag set: field-kind dispatch is
    # TAG-based (serialize.CONTROL_TAGS has the full rationale); shared
    # with the Python engine and the serializers so the four dispatch
    # sites cannot drift
    control_tags = sorted(CONTROL_TAGS)

    def _record_from_classified(v, entries):
        ctrl = F.transform(
            # control field: control TAG with a non-object body; the
            # variant->string cast projects scalars/arrays to their JSON
            # text exactly like the Python engine's json.dumps coercion
            F.filter(
                entries,
                lambda e: e["key"].isin(control_tags) & (e["k"] != "O"),
            ),
            lambda e: F.struct(
                e["key"].alias("tag"), body_str(e["value"]).alias("value")
            ),
        )
        data = F.transform(
            F.filter(
                entries,
                lambda e: ~e["key"].isin(control_tags) & (e["k"] == "O"),
            ),
            lambda e: let(
                e["value"],
                lambda body: F.struct(
                    e["key"].alias("tag"),
                    ind_expr(body, "$.ind1").alias("ind1"),
                    ind_expr(body, "$.ind2").alias("ind2"),
                    subfield_structs(body).alias("subfields"),
                ),
            ),
        )
        leader = let(
            F.try_variant_get(v, "$.leader", "string"),
            lambda ld: F.when(
                ld.isNull() | (ld == ""), F.lit(" " * 24)
            ).otherwise(ld),
        )
        # strict line-drop parity with the Python rescue: an OBJECT body
        # under a control tag (ruby DataField#initialize raises), a
        # non-object body under a data tag (ControlField#initialize
        # raises), or a data field with a missing/corrupt subfield list,
        # invalidates the WHOLE record (null -> dropped by build's filter)
        return let2(
            ctrl,
            data,
            lambda cfs, dfs: F.when(
                ~F.exists(
                    entries,
                    lambda e: F.when(
                        e["key"].isin(control_tags), e["k"] == "O"
                    ).otherwise(e["k"] != "O"),
                )
                & ~F.exists(dfs, lambda d: d["subfields"].isNull()),
                F.struct(
                    F.get(
                        F.filter(cfs, lambda c: c["tag"] == id_tag), 0
                    )["value"].alias("record_id"),
                    F.struct(
                        leader.alias("leader"),
                        cfs.alias("controlfields"),
                        dfs.alias("datafields"),
                    ).alias("marc"),
                ),
            ),
        )

    def build(v):
        # flatten() returns null if ANY element is null -> a record with
        # a non-object field entry drops whole, like the Python path's
        # AttributeError rescue; missing/empty "fields" stays a valid
        # (empty) record; non-object lines (scalars/arrays/bad JSON)
        # drop, like the JSONDecodeError rescue
        entries = F.when(
            ~F.coalesce(
                F.schema_of_variant(v).startswith("OBJECT"), F.lit(False)
            ),
            F.lit(None),
        ).otherwise(
            let2(
                F.try_variant_get(v, "$.fields", "variant"),
                F.try_variant_get(v, "$.fields", "array<variant>"),
                # MISSING "fields" key (or explicit null) -> a valid empty
                # record, matching the Python engine's `get("fields") or
                # []`; a PRESENT non-array value ("fields": "oops" / 5 /
                # {...}) -> null -> whole line drops, matching the Python
                # engine iterating the non-array and raising into the
                # rescue (ruby: hash['fields'].each raises the same way).
                # Coalescing the failed array cast to F.array() here used
                # to emit a phantom empty record for those lines.
                lambda fv, fields: F.when(
                    fv.isNull() | F.is_variant_null(fv), F.array()
                )
                .when(fields.isNull(), F.lit(None))
                .otherwise(F.flatten(F.transform(fields, entries_of))),
            )
        )
        # 0/1-element array: explode IS the bad-line filter, keeping the
        # whole parse in one Generate input expression (evaluated once);
        # built as [maybe-null] + filter so both branches share the
        # struct element type (a bare F.array() would be array<void>)
        return let(
            entries,
            lambda es: F.filter(
                F.array(
                    F.when(es.isNotNull(), record_from_entries(v, es))
                ),
                lambda x: x.isNotNull(),
            ),
        )

    rec = let(F.try_parse_json(F.col("value")), build)
    return lines.select(F.explode(rec).alias("r")).select(
        "r.record_id", "r.marc"
    )


#: ISO 2709's record length field is 5 decimal digits, so a conformant
#: record is < 100,000 bytes; range tasks read this much past their end
#: (plus slack for inter-record padding) to complete a straddling record
ISO2709_MAX_RECORD = 100_000


def _list_input_sizes(spark: SparkSession, paths) -> list:
    """[(file-URI, size)] for the input spec. Local specs (plain paths,
    file: URIs, globs, directories) list via ``os`` — zero Spark jobs,
    so the common case adds nothing to the hot ingest path. Anything
    with a non-file scheme falls back to one metadata-only binaryFile
    job (path+length; content pruned)."""
    import glob as _glob
    import os as _os
    import urllib.parse as _up

    def _dir_files(d: str) -> list:
        # Spark's file index: top-level files, skipping hidden and
        # _-prefixed entries (_SUCCESS and friends)
        return [
            e.path
            for e in _os.scandir(d)
            if e.is_file() and not e.name.startswith((".", "_"))
        ]

    specs = [paths] if isinstance(paths, str) else list(paths)
    out = []
    for spec in specs:
        if "://" in spec and not spec.startswith("file:"):
            break  # remote scheme -> Spark listing below
        local = _up.unquote(_up.urlsplit(spec).path) if spec.startswith(
            "file:"
        ) else spec
        if any(c in local for c in "*?["):
            hits = _glob.glob(local)
            if not hits:
                break
            # a glob that matches a DIRECTORY lists its files, exactly
            # like Hadoop's glob expansion — dropping them here would
            # silently unread whole directories on the split path
            files = [h for h in hits if _os.path.isfile(h)]
            for h in hits:
                if _os.path.isdir(h):
                    files.extend(_dir_files(h))
        elif _os.path.isdir(local):
            files = _dir_files(local)
        elif _os.path.isfile(local):
            files = [local]
        else:
            break  # unresolvable locally -> let Spark raise/list
        out.extend(
            (f"file:{_up.quote(_os.path.abspath(f))}", _os.path.getsize(f))
            for f in files
        )
    else:
        return out
    return [
        (r["path"], r["length"])
        for r in spark.read.format("binaryFile")
        .load(paths)
        .select("path", "length")
        .collect()
    ]


def _iso2709_split_ranges(
    meta: list, split_bytes: int, range_bytes: Optional[int] = None
) -> tuple:
    """(ranges, small_or_remote_count): byte ranges for local files above
    ``split_bytes``; everything else stays on the whole-file path.

    Range SIZE is ``min(split_bytes, range_bytes)`` — the trigger and
    the granularity are different decisions: a 2 GB file measured 62s
    at 128 MB ranges vs 221s at 512 MB ranges on local[32] (more tasks,
    better balance), while the trigger stays high so ordinary files
    never pay the split machinery."""
    step_target = min(split_bytes, range_bytes or split_bytes)
    ranges = []
    other = 0
    for path, length in meta:
        if length > split_bytes and path.startswith("file:"):
            n = (length + step_target - 1) // step_target
            step = (length + n - 1) // n
            for i in range(n):
                ranges.append(
                    (path, i * step, min((i + 1) * step, length), length)
                )
        else:
            other += 1
    return ranges, other


def read_iso2709(
    spark: SparkSession,
    paths,
    id_tag: str = "001",
    encoding: str = "utf-8",
    split_bytes: int = 512 << 20,
    range_bytes: int = 128 << 20,
) -> DataFrame:
    """Binary MARC via the binaryFile source + per-file stream split
    (marc_reader.rb binary branch :78-80).

    Large-file splitting (r13 verdict #7): binaryFile is one-task-per-
    file, so at 100 TB a single 10 GB .mrc would serialize on one core.
    Files larger than ``split_bytes`` on locally-openable storage
    (file: scheme — local disk or a POSIX-mounted shared FS) are
    instead read as parallel BYTE RANGES: each task seeks to its range,
    resyncs on the 0x1D record terminator (a record is owned by the
    range containing its first byte), and reads up to
    ``ISO2709_MAX_RECORD`` + slack past its end to complete a
    straddling record — the same boundary discipline Hadoop text splits
    use for newlines, valid here because conformant records are bounded
    by the 5-digit length field. Non-local large files fall back to
    whole-file with a loud stderr warning naming the file and the
    ~50k-records/file sizing discipline (TESTDATA fixtures follow it).
    The file listing is os-side for local specs (zero Spark jobs; a
    metadata-only binaryFile job only for remote schemes), and when
    nothing exceeds the threshold the plan is exactly the r12 narrow
    whole-file plan — an interleaved A/B on the 600k bench lane read
    1.04x, within window noise. Measured payoff (local[32]): one
    160 MB / 425k-record file reads 3.1x faster at 16 MB ranges than
    whole-file (5.6s vs 17.5s), and under a 1 GiB heap the whole-file
    read OOMs outright where ranges stream. At 2 GB (5.4M records,
    zero boundary dupes/drops verified by countDistinct) the
    whole-file path is not merely slow but PATHOLOGICAL — binaryFile
    caps content at Int.MaxValue and the single-row Arrow transfer to
    Python strangles in buffer growth near the 2 GiB batch limit —
    while ranges read it in 62s at the 128 MB default granularity
    (``range_bytes``; 221s at 512 MB ranges — the trigger and the
    granularity are separate decisions)."""
    import urllib.parse as _up

    meta = _list_input_sizes(spark, paths)
    ranges, _ = _iso2709_split_ranges(meta, split_bytes, range_bytes)
    for path, length in meta:
        if length > split_bytes and not path.startswith("file:"):
            import sys as _sys

            print(
                f"read_iso2709: {path} is {length / (1 << 30):.1f} GiB on "
                "non-local storage — one task must stream it whole "
                "(byte-range splitting needs a locally-openable path), "
                "and above ~2 GiB the whole-file read FAILS outright "
                "(binaryFile content caps at Int.MaxValue). For parallel "
                "ingest store many moderate files (~50k records each) or "
                "copy to a POSIX mount.",
                file=_sys.stderr,
            )

    if ranges:
        # the whole-file branch loads ONLY the non-split paths,
        # explicitly: a filter on (length, path) over the full load is
        # NOT pushable into the binaryFile scan (the OR with the path
        # scheme blocks it), so Spark would materialize every
        # multi-GB split file's content as a row just to discard it —
        # measured as one core pegged for 20+ minutes on a 2 GB file
        split_paths = {p for (p, _s, _e, _l) in ranges}
        # Hadoop Path does NOT percent-decode, so the percent-quoted
        # file: URIs _list_input_sizes builds (quoted so the range
        # rows' unquote round-trips filenames with literal '%') must be
        # UNquoted before the Spark load — a quoted space/umlaut would
        # be file-not-found here. Remote-scheme paths came from Spark's
        # own listing and pass through verbatim.
        whole_paths = [
            "file:" + _up.unquote(_up.urlsplit(p).path)
            if p.startswith("file:")
            else p
            for (p, _l) in meta
            if p not in split_paths
        ]
        files = (
            spark.read.format("binaryFile").load(whole_paths)
            if whole_paths
            else None
        )
    else:
        # no ranges -> EXACTLY the pre-split plan (no extra jobs)
        files = spark.read.format("binaryFile").load(paths)
    if files is not None:
        files = files.select("content")

    # bounded output batches (r12): one yield per FILE made the Arrow
    # conversion superlinear — a 110 MB file is ~190k nested record
    # dicts materialized as one giant pandas batch before serialization
    # (the sf1 soak read 17x time for 10x data). batched_rows keeps
    # per-task memory flat no matter how large the input files are —
    # the property that matters at 100 TB, where file sizes are not
    # under our control.
    def parse(batches: Iterator) -> Iterator:
        def rows():
            for batch in batches:
                for content in batch.column(0).to_pylist():
                    for raw in split_iso2709_stream(content):
                        rec = from_iso2709(raw, encoding)
                        if rec is not None:
                            yield (_id_from(rec, id_tag), rec)

        yield from _marc_batches(rows())

    whole = (
        files.mapInArrow(parse, MARC_SOURCE_SCHEMA)
        if files is not None
        else None
    )
    if not ranges:
        return whole

    def parse_ranges(batches: Iterator) -> Iterator:
        import urllib.parse as _up

        RT = b"\x1d"
        # overrun past the range end: one max-size record + generous
        # slack for inter-record padding (\n\r\x00 runs); a "record"
        # that exceeds this is corrupt and is dropped at the boundary,
        # the same per-record degradation posture as the whole-file path
        overrun = ISO2709_MAX_RECORD + (1 << 20)

        def range_rows(path, start, end, file_len):
            local = _up.unquote(_up.urlsplit(path).path)
            with open(local, "rb") as fh:
                rs = max(0, start - 1)
                fh.seek(rs)
                buf = fh.read((end - rs) + overrun)
            if start == 0:
                cur = 0  # file offset 0 is a record start
            else:
                # first record START at file offset >= start is the
                # byte after the first terminator at offset >= start-1
                p = buf.find(RT)
                if p == -1:
                    return  # no record starts inside this range
                cur = p + 1
            last_range = end == file_len
            while rs + cur < end:
                nxt = buf.find(RT, cur)
                if nxt == -1:
                    # unterminated tail: a real (vendor) final record
                    # only on the file's last range; mid-file it means
                    # a corrupt >overrun span — drop, like the
                    # whole-file splitter drops undecodable garbage
                    if last_range:
                        seg = buf[cur:]
                        if seg.strip(b"\x00\r\n "):
                            rec = from_iso2709(
                                seg.lstrip(b"\x00\r\n ") + RT, encoding
                            )
                            if rec is not None:
                                yield (_id_from(rec, id_tag), rec)
                    return
                seg = buf[cur : nxt + 1]
                if seg[:-1].strip(b"\x00\r\n "):
                    rec = from_iso2709(
                        seg.lstrip(b"\x00\r\n "), encoding
                    )
                    if rec is not None:
                        yield (_id_from(rec, id_tag), rec)
                cur = nxt + 1

        def rows():
            for batch in batches:
                for path, start, end, file_len in zip(
                    *(batch.column(i).to_pylist() for i in range(4))
                ):
                    yield from range_rows(
                        path, int(start), int(end), int(file_len)
                    )

        yield from _marc_batches(rows())

    range_df = spark.createDataFrame(
        ranges, "path string, start long, end long, file_len long"
    ).repartition(len(ranges))
    split_part = range_df.mapInArrow(parse_ranges, MARC_SOURCE_SCHEMA)
    if whole is None:
        return split_part  # every input file range-split
    return whole.unionByName(split_part)


# ---------------------------------------------------------------------------
# MARCXML
# ---------------------------------------------------------------------------

def _record_el_to_dict(rec_el) -> dict:
    """One complete MARCXML <record> element -> struct record dict.

    Shared by the string parser (``parse_marcxml``) and the streaming
    parser (``iterparse_marcxml``) so the two can never drift."""
    leader = " " * 24
    ctrl, data = [], []
    for el in rec_el:
        name = el.tag.rsplit("}", 1)[-1]
        if name == "leader":
            leader = el.text or " " * 24
        elif name == "controlfield":
            ctrl.append({"tag": el.get("tag"), "value": el.text or ""})
        elif name == "datafield":
            subfields = [
                {"code": sf.get("code"), "value": sf.text or ""}
                for sf in el
                if sf.tag.rsplit("}", 1)[-1] == "subfield"
            ]
            data.append(
                {
                    "tag": el.get("tag"),
                    "ind1": el.get("ind1", " "),
                    "ind2": el.get("ind2", " "),
                    "subfields": subfields,
                }
            )
    return {"leader": leader, "controlfields": ctrl, "datafields": data}


def parse_marcxml(text: str) -> list[dict]:
    """Parse a MARCXML *string* (any namespace) into struct record dicts.

    Whole-string DOM parse — fine for the per-record round-trip /
    golden-test callers this serves. The distributed reader path uses
    :func:`iterparse_marcxml` (O(record) memory) instead."""
    import xml.etree.ElementTree as ET

    def local(el) -> str:
        return el.tag.rsplit("}", 1)[-1]

    root = ET.fromstring(text)
    candidates = [root] if local(root) == "record" else [
        el for el in root.iter() if local(el) == "record"
    ]
    # innermost-only: an OAI-PMH wrapper <record> CONTAINING the MARC
    # <record> must not emit a phantom empty record (blank leader, no
    # fields, null id) alongside the real one — keep only record
    # elements with no nested record inside (total cost is one pass
    # over each candidate's subtree; records never nest in plain files)
    records = [
        el
        for el in candidates
        if not any(local(d) == "record" for d in el.iter() if d is not el)
    ]
    return [_record_el_to_dict(el) for el in records]


def iterparse_marcxml(stream) -> Iterator[dict]:
    """Stream-parse MARCXML from a binary file-like object, yielding one
    struct record dict per innermost <record> element.

    O(record) task memory (r13 verdict #1): ``ET.iterparse`` end-events
    only — each record element is converted as soon as it closes, then
    ``.clear()``-ed. The innermost-only rule (OAI wrapper <record>
    containing the MARC <record> must not emit a phantom empty record)
    ports exactly because a cleared inner record element stays ATTACHED
    to its wrapper: at the wrapper's own end event the one-pass
    descendant scan still sees it and suppresses the wrapper. Cleared
    elements accumulate under the collection root as empty shells
    (tag + attrib dict, ~100 bytes each) — negligible next to the DOM
    this replaces.

    Encoding comes from the XML declaration (expat), not an assumed
    UTF-8 — strictly more correct than the text-source read this
    replaced. Raises ``ET.ParseError`` on malformed input; records
    yielded before the error are valid (salvage semantics, like the
    ISO-2709 reader's per-record recovery)."""
    import xml.etree.ElementTree as ET

    for _event, elem in ET.iterparse(stream, events=("end",)):
        if elem.tag.rsplit("}", 1)[-1] == "record":
            if not any(
                d.tag.rsplit("}", 1)[-1] == "record"
                for d in elem.iter()
                if d is not elem
            ):
                yield _record_el_to_dict(elem)
            elem.clear()


# -- MARCXML byte-range splitting (r15, VERDICT r14 #2) ---------------------
#
# XML is not byte-range-splittable in GENERAL, but a plain MARCXML
# collection file is in PRACTICE: record elements are siblings under one
# root, their content is escaped (raw ``<record`` cannot legally appear
# in text), and the per-record parser is already namespace-agnostic. A
# range task scans for ``<record``/``<prefix:record`` start tags, owns
# every record whose START byte lies inside its range (the same
# ownership discipline as the ISO-2709 0x1D resync and Hadoop text
# splits), depth-balances to the matching end tag, and parses each span
# standalone under a synthetic wrapper carrying the root element's
# xmlns declarations. Shapes that cannot be split soundly REFUSE or
# fall back loudly instead of risking silent dupes/drops:
#
# - nested records (an OAI-PMH wrapper <record> containing the MARC
#   <record>): a range cannot tell an inner start from a top-level one,
#   so the range that owns the OUTER record detects the nesting and
#   RAISES — the job fails loudly, never emits duplicates.
# - compressed / non-UTF-8 / remote files: whole-file path + a loud
#   driver-side warning naming the threshold and the sizing discipline.
# - comments/CDATA containing record-tag lookalikes would defeat the
#   byte scan (the same caveat quoted-newline CSVs have under Hadoop
#   text splits); such files surface as parse errors, and the split
#   path always raises on malformed spans (per-file salvage semantics
#   need file ownership, which ranges don't have) — read with
#   ``split_bytes=None`` for the skip/salvage posture.

_XML_REC_START = None  # compiled lazily below (keeps import light)
_XML_REC_END = None


def _xml_rec_patterns():
    global _XML_REC_START, _XML_REC_END
    if _XML_REC_START is None:
        import re

        _XML_REC_START = re.compile(rb"<(?:[A-Za-z_][\w.-]*:)?record(?=[\s/>])")
        _XML_REC_END = re.compile(rb"</(?:[A-Za-z_][\w.-]*:)?record\s*>")
    return _XML_REC_START, _XML_REC_END


def _scan_record_element(buf: bytes, s: int) -> Optional[int]:
    """End offset (exclusive) of the record element whose start tag
    begins at ``s``, by depth-balanced scanning of record start/end
    tags (nested records and self-closing ``<record/>`` handled);
    None when the close lies beyond the buffer."""
    start_re, end_re = _xml_rec_patterns()
    depth = 0
    cur = s
    while True:
        ms = start_re.search(buf, cur)
        me = end_re.search(buf, cur)
        if ms is not None and (me is None or ms.start() < me.start()):
            gt = buf.find(b">", ms.end())
            if gt == -1:
                return None
            if buf[gt - 1] == 0x2F:  # '/>': self-closing
                if depth == 0:
                    return gt + 1
            else:
                depth += 1
            cur = gt + 1
        elif me is not None:
            depth -= 1
            cur = me.end()
            if depth <= 0:
                return cur
        else:
            return None


def iter_marcxml_record_spans(buf: bytes, limit: int):
    """(start, end) byte spans of record elements whose START offset is
    below ``limit`` (range ownership); scanning resumes from each
    element's end, so record starts nested inside an owned span are
    never emitted as their own spans. Raises ValueError when an owned
    element's close lies beyond the buffer (overrun exceeded or
    malformed markup)."""
    start_re, _ = _xml_rec_patterns()
    pos = 0
    while True:
        m = start_re.search(buf, pos)
        if m is None or m.start() >= limit:
            return
        e = _scan_record_element(buf, m.start())
        if e is None:
            raise ValueError(
                f"record element at buffer offset {m.start()} has no "
                "close within the read window"
            )
        yield m.start(), e
        pos = e


def _marcxml_head_info(local_path: str) -> tuple:
    """(eligible, reason, ns_decls) for byte-range splitting, from the
    file's first 64 KB: refuses compressed payloads and non-UTF-8
    encodings (the byte scan and the standalone span parse both assume
    an ASCII-transparent UTF-8 stream), and captures the ROOT element's
    xmlns declarations so spans parse standalone under a synthetic
    wrapper (a ``marc:`` prefix or default namespace declared on
    <collection> would otherwise be unbound in every span)."""
    import re

    with open(local_path, "rb") as fh:
        head = fh.read(64 << 10)
    if (
        head[:2] == b"\x1f\x8b"
        or head[:3] == b"BZh"
        or head[:6] == b"\xfd7zXZ\x00"
    ):
        return (
            False,
            "compressed payload (decompression is a sequential stream; "
            "a .gz can inflate ~10x past the threshold)",
            "",
        )
    if head[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return (False, "UTF-16 byte-order mark", "")
    m = re.search(rb"<\?xml[^>]*?encoding=[\"']([^\"']+)", head[:256])
    if m and m.group(1).lower() not in (b"utf-8", b"utf8", b"us-ascii", b"ascii"):
        return (
            False,
            f"declared encoding {m.group(1).decode('ascii', 'replace')!r} "
            "is not ASCII-transparent",
            "",
        )
    # skip prolog (BOM, declaration, comments, DOCTYPE) to the root tag
    i = 3 if head[:3] == b"\xef\xbb\xbf" else 0
    while True:
        j = head.find(b"<", i)
        if j == -1:
            return (False, "no root element within the first 64 KB", "")
        if head[j : j + 4] == b"<!--":
            k = head.find(b"-->", j)
            if k == -1:
                return (False, "unterminated comment in prolog", "")
            i = k + 3
        elif head[j : j + 2] == b"<?":
            k = head.find(b"?>", j)
            if k == -1:
                return (False, "unterminated processing instruction", "")
            i = k + 2
        elif head[j : j + 2] == b"<!":
            k = head.find(b">", j)
            if k == -1:
                return (False, "unterminated DOCTYPE in prolog", "")
            i = k + 1
        else:
            root_start = j
            break
    gt = head.find(b">", root_start)
    if gt == -1:
        return (False, "root start tag exceeds 64 KB", "")
    tag = head[root_start : gt + 1]
    ns = b" ".join(
        m.group(0)
        for m in re.finditer(
            rb"xmlns(?::[\w.-]+)?\s*=\s*(?:\"[^\"]*\"|'[^']*')", tag
        )
    )
    return (True, "", ns.decode("utf-8", "replace"))


def _marcxml_split_plan(
    meta: list, split_bytes: int, range_bytes: Optional[int]
) -> tuple:
    """(ranges, warnings): byte ranges for local, uncompressed,
    ASCII-transparent files above ``split_bytes``; every other
    over-threshold file stays whole-file and is returned as
    (path, length, reason) for the driver-side warning."""
    import urllib.parse as _up

    step_target = min(split_bytes, range_bytes or split_bytes)
    ranges, warns = [], []
    for path, length in meta:
        if length <= split_bytes:
            continue
        if not path.startswith("file:"):
            warns.append(
                (path, length, "non-local storage (byte-range splitting "
                 "needs a locally-openable path)")
            )
            continue
        local = _up.unquote(_up.urlsplit(path).path)
        ok, reason, ns = _marcxml_head_info(local)
        if not ok:
            warns.append((path, length, reason))
            continue
        n = (length + step_target - 1) // step_target
        step = (length + n - 1) // n
        for i in range(n):
            ranges.append(
                (path, i * step, min((i + 1) * step, length), ns)
            )
    return ranges, warns


def read_marcxml(
    spark: SparkSession,
    paths,
    id_tag: str = "001",
    strict: bool = False,
    skipped_files: Optional[object] = None,
    split_bytes: Optional[int] = 512 << 20,
    range_bytes: int = 64 << 20,
    overrun_bytes: int = 8 << 20,
) -> DataFrame:
    """MARCXML files -> struct records (marc_reader.rb xml branch :72-74).

    Stream-parsed (r13 verdict #1): the binaryFile source hands the task
    one file's RAW bytes (for .gz inputs that is the ~10x-smaller
    compressed payload — gunzip happens incrementally Python-side), and
    :func:`iterparse_marcxml` converts each record as its element
    closes. Task memory is O(compressed file bytes) + O(one record) —
    the whole-file-DOM shape this replaced (JVM 2-byte/char string +
    Python str + full ElementTree, ~5-10x file size) made 32 concurrent
    multi-hundred-MB parses GC-pressure-sensitive and was the r13 bench
    variance outlier. Distribution is at file granularity for ordinary
    files (many moderate files parallelize best), byte-range parallel
    for oversized local collection files (below), and output batches
    stay bounded via batched_rows regardless of file size.

    Error posture: by default a malformed / truncated / empty file is
    skipped — but complete records parsed BEFORE the error are kept
    (salvage, like the ISO-2709 reader's per-record recovery; the old
    DOM reader dropped the whole file). One bad file in a drop directory
    must not kill a whole-corpus ingest, yet a silent executor-side
    print is not a driver-visible signal (the reference NokogiriReader
    fails FAST on a bad document), so:

    - ``strict=True`` re-raises the parse error and fails the job —
      reference fail-fast parity.
    - ``skipped_files`` accepts a Spark ``Accumulator`` (e.g.
      ``spark.sparkContext.accumulator(0)``); each file that hit a parse
      error adds 1, so after an action the driver can warn or raise on a
      nonzero count.

    Large-file posture (r15, VERDICT r14 #2 — the same discipline as
    ``read_iso2709``): local, uncompressed, ASCII-transparent files
    above ``split_bytes`` are read as parallel BYTE RANGES resyncing on
    ``<record`` start tags (see the splitting block above for the
    soundness argument and refusals); anything over the threshold that
    cannot split — compressed, remote, UTF-16 — stays one task with a
    LOUD stderr warning, because above ~2 GiB raw the binaryFile
    content cap makes the whole-file read fail outright, exactly like
    the ISO-2709 case. ``split_bytes=None`` disables the splitting
    machinery entirely (zero listing work, the exact r14 plan) and is
    also how to read OAI-PMH-wrapped files that exceed the threshold.
    Error posture on the split path: malformed spans always RAISE
    (per-file salvage needs file ownership, which ranges don't have).
    Measured (local[32]): a single 572 MB / 1.2M-record file reads
    3.5x faster at the 64 MB default ranges than whole-file (37.0s vs
    130.4s; 43.6s at 128 MB — XML parse is CPU-heavier per byte than
    ISO-2709, so the default granularity is finer than the ISO
    reader's)."""
    if split_bytes is not None:
        meta = _list_input_sizes(spark, paths)
        ranges, warns = _marcxml_split_plan(meta, split_bytes, range_bytes)
        for wpath, wlen, reason in warns:
            import sys as _sys

            print(
                f"read_marcxml: {wpath} is {wlen / (1 << 30):.1f} GiB — "
                f"cannot byte-range split: {reason}. One task must "
                "stream it whole, and above ~2 GiB raw the read FAILS "
                "outright (binaryFile content caps at Int.MaxValue). "
                "For parallel ingest store many moderate files "
                "(~50k records each), or decompress/copy to a POSIX "
                "mount so splitting applies.",
                file=_sys.stderr,
            )
    else:
        meta, ranges = [], []

    if ranges:
        # whole-file branch loads ONLY the non-split paths, explicitly
        # (same plan discipline as read_iso2709: the OR-filter cannot
        # push into the binaryFile scan). Unquote before the Spark load
        # — Hadoop Path does not percent-decode.
        import urllib.parse as _up

        split_paths = {p for (p, _s, _e, _ns) in ranges}
        whole_paths = [
            "file:" + _up.unquote(_up.urlsplit(p).path)
            if p.startswith("file:")
            else p
            for (p, _l) in meta
            if p not in split_paths
        ]
        files = (
            spark.read.format("binaryFile").load(whole_paths)
            if whole_paths
            else None
        )
    else:
        # no ranges -> EXACTLY the pre-split plan (no extra jobs)
        files = spark.read.format("binaryFile").load(paths)
    if files is not None:
        files = files.select("content")

    def parse(batches: Iterator) -> Iterator:
        import bz2 as _bz2
        import gzip as _gzip
        import io as _io
        import lzma as _lzma
        import sys as _sys
        import xml.etree.ElementTree as _ET
        import zlib as _zlib

        # bounded output batches (r12, same fix as read_iso2709): one
        # yield per input batch of whole files makes Arrow conversion
        # memory proportional to FILE size; _marc_batches also yields
        # NOTHING for an all-skipped input.
        def rows():
            for batch in batches:
                for raw in batch.column(0).to_pylist():
                    stream = _io.BytesIO(raw)
                    # magic-byte sniff, not path suffix: binaryFile
                    # does not decompress, and renamed files must still
                    # stream. Covers the Hadoop codecs the old text
                    # source decompressed that the stdlib also speaks —
                    # gzip, bzip2, xz/lzma; deflate/snappy/lz4/zstd have
                    # no stdlib streamer and skip as malformed (loudly)
                    if raw[:2] == b"\x1f\x8b":
                        stream = _gzip.GzipFile(fileobj=stream)
                    elif raw[:3] == b"BZh":
                        stream = _bz2.BZ2File(stream)
                    elif raw[:6] == b"\xfd7zXZ\x00":
                        stream = _lzma.LZMAFile(stream)
                    try:
                        for rec in iterparse_marcxml(stream):
                            yield (_id_from(rec, id_tag), rec)
                    except (
                        _ET.ParseError,
                        OSError,
                        EOFError,
                        _lzma.LZMAError,
                        _zlib.error,
                    ) as e:
                        # OSError/EOFError/LZMAError: truncated or
                        # corrupt compressed stream. zlib.error is NOT
                        # an OSError subclass: a gzip member whose
                        # deflate body is corrupt raises it from
                        # GzipFile.read (verified empirically) — without
                        # it one corrupt .gz failed the whole ingest
                        # even with strict=False (r15 advice fix)
                        if strict:
                            raise ValueError(
                                f"read_marcxml: malformed XML input "
                                f"({e}; {len(raw)} bytes); "
                                "pass strict=False to skip bad files"
                            ) from e
                        if skipped_files is not None:
                            skipped_files.add(1)
                        print(
                            f"read_marcxml: malformed XML input "
                            f"({e}; {len(raw)} bytes); kept records "
                            "parsed before the error, skipping the rest",
                            file=_sys.stderr,
                        )
                        continue

        yield from _marc_batches(rows())

    whole = (
        files.mapInArrow(parse, MARC_SOURCE_SCHEMA)
        if files is not None
        else None
    )
    if not ranges:
        return whole

    def parse_ranges(batches: Iterator) -> Iterator:
        import urllib.parse as _up
        import xml.etree.ElementTree as _ET

        def range_rows(path, start, end, ns_decls):
            local = _up.unquote(_up.urlsplit(path).path)
            # overrun past the range end to complete a straddling
            # record — generous: binary MARC caps records at 99,999
            # bytes and XML inflates that ~3-5x
            with open(local, "rb") as fh:
                fh.seek(start)
                buf = fh.read((end - start) + overrun_bytes)
            prefix = (
                b"<w " + ns_decls.encode() + b">" if ns_decls else b"<w>"
            )
            try:
                for s, e in iter_marcxml_record_spans(buf, end - start):
                    rec_el = _ET.fromstring(prefix + buf[s:e] + b"</w>")[0]
                    if any(
                        d.tag.rsplit("}", 1)[-1] == "record"
                        for d in rec_el.iter()
                        if d is not rec_el
                    ):
                        raise ValueError(
                            "nested <record> elements (an OAI-PMH "
                            "wrapper shape) cannot be byte-range split "
                            "soundly — read with split_bytes=None"
                        )
                    rec = _record_el_to_dict(rec_el)
                    yield (_id_from(rec, id_tag), rec)
            except (_ET.ParseError, ValueError) as e:
                raise ValueError(
                    f"read_marcxml: {path} bytes [{start}, {end}): {e} "
                    "— the split path raises on malformed spans; read "
                    "with split_bytes=None for per-file skip/salvage"
                ) from e

        def rows():
            for batch in batches:
                for path, start, end, ns in zip(
                    *(batch.column(i).to_pylist() for i in range(4))
                ):
                    yield from range_rows(path, int(start), int(end), ns)

        yield from _marc_batches(rows())

    range_df = spark.createDataFrame(
        ranges, "path string, start long, end long, ns_decls string"
    ).repartition(len(ranges))
    split_part = range_df.mapInArrow(parse_ranges, MARC_SOURCE_SCHEMA)
    if whole is None:
        return split_part  # every input file range-split
    return whole.unionByName(split_part)
