"""Pipeline/engine tests — the moral port of to_field_test.rb,
each_record_test.rb, read_write_test.rb behaviors."""

import pytest
from pyspark.sql import functions as F

from traject_spark import Pipeline, extract_marc, literal, transforms as T
from traject_spark.marc.schema import MARC_SOURCE_SCHEMA

from tests.fixtures import BOOK, EMPTY, THE_TITLE


def source_df(spark, *recs):
    return spark.createDataFrame(list(recs), MARC_SOURCE_SCHEMA)


def test_map_record_minimum_slice(spark):
    # SURVEY §7 M0 acceptance: title from 245ab
    p = Pipeline().to_field("title", extract_marc("245ab"))
    out = p.map_record(BOOK, spark)
    assert out == {
        "title": ["Manufacturing consent : the political economy of the mass media /"]
    }


def test_empty_record_produces_empty_hash(spark):
    # the reference's empty-record guard (test_helper.rb:50-54)
    p = (
        Pipeline()
        .to_field("title", extract_marc("245ab"))
        .to_field("author", extract_marc("100a"))
    )
    assert p.map_record(EMPTY, spark) == {}


def test_macro_chain_within_rule(spark):
    p = Pipeline().to_field(
        "title", extract_marc("245a"), T.trim_punctuation(), T.append("!")
    )
    assert p.map_record(BOOK, spark) == {"title": ["Manufacturing consent!"]}


def test_multiple_to_field_same_name_concat_in_order(spark):
    p = (
        Pipeline()
        .to_field("names", extract_marc("100a"))
        .to_field("names", extract_marc("700a"))
    )
    assert p.map_record(BOOK, spark) == {
        "names": ["Herman, Edward S.", "Chomsky, Noam."]
    }


def test_to_field_multiple_names(spark):
    p = Pipeline().to_field(["t1", "t2"], extract_marc("245a"))
    out = p.map_record(BOOK, spark)
    assert out["t1"] == out["t2"] == ["Manufacturing consent :"]


def test_literal_and_default(spark):
    p = (
        Pipeline()
        .to_field("const", literal("always"))
        .to_field("missing", extract_marc("999z"), T.default("fallback"))
    )
    assert p.map_record(BOOK, spark) == {
        "const": ["always"],
        "missing": ["fallback"],
    }


def test_extract_marc_options(spark):
    p = (
        Pipeline()
        .to_field("first_isbn", extract_marc("020a", first=True))
        .to_field("trimmed", extract_marc("245a", trim_punctuation=True))
        .to_field("with_default", extract_marc("999a", default="NONE"))
        .to_field(
            "translated",
            extract_marc("008[35-37]", translation_map={"eng": "English"}),
        )
    )
    assert p.map_record(BOOK, spark) == {
        "first_isbn": ["0394549260 :"],
        "trimmed": ["Manufacturing consent"],
        "with_default": ["NONE"],
        "translated": ["English"],
    }


def test_extract_marc_dedups_by_default(spark):
    # two 650s with the same $a "Mass media" -> deduped by default,
    # kept with allow_duplicates (marc21.rb:133-135)
    p = (
        Pipeline()
        .to_field("subj", extract_marc("650a"))
        .to_field("subj_dup", extract_marc("650a", allow_duplicates=True))
    )
    out = p.map_record(BOOK, spark)
    assert out["subj"] == ["Mass media"]
    assert out["subj_dup"] == ["Mass media", "Mass media"]


def test_unknown_extract_marc_option_raises():
    with pytest.raises(ValueError):
        extract_marc("245a", bogus=True)


def test_out_of_range_byteslice_nil_dropped_and_no_default(spark):
    # accumulator holds [nil] -> not empty -> default does NOT fire;
    # nil then dropped at add_output -> field omitted (SURVEY §4 + §1.2)
    from traject_spark.marc.schema import marc_record

    p = Pipeline().to_field(
        "lang", extract_marc("008[35-37]", default="missing")
    )
    short_008 = marc_record(controlfields=[("008", "short")])
    no_008 = marc_record(controlfields=[("001", "x")])
    # short 008 -> [nil] -> default does NOT fire -> nil dropped -> omitted
    assert p.map_record(short_008, spark) == {}
    # absent 008 -> [] -> default DOES fire
    assert p.map_record(no_008, spark) == {"lang": ["missing"]}


def test_each_record_add_output_and_skip(spark):
    def step(ctx):
        ctx.add_output("has_title", F.array(F.lit("yes")))
        ctx.skip_when(F.size(ctx.marc["datafields"]) == 0)

    p = Pipeline().to_field("title", extract_marc("245a")).each_record(step)
    df = source_df(spark, ("b", BOOK), ("e", EMPTY))
    rows = p.apply(df).collect()
    # EMPTY has no datafields -> skipped entirely (produces nothing)
    assert len(rows) == 1
    assert rows[0]["record_id"] == "b"
    assert rows[0]["has_title"] == ["yes"]


def test_each_record_reads_earlier_output(spark):
    def step(ctx):
        ctx.add_output("title_count", F.array(F.size(ctx.output("title")).cast("string")))

    p = Pipeline().to_field("title", extract_marc("245a:700a", allow_duplicates=True)).each_record(step)
    out = p.map_record(BOOK, spark)
    assert out["title_count"] == ["2"]


def test_apply_batch_and_order(spark):
    p = Pipeline().to_field("title", extract_marc("245a", trim_punctuation=True))
    df = source_df(spark, ("r1", BOOK), ("r2", THE_TITLE), ("r3", EMPTY))
    rows = p.apply(df).collect()
    by_id = {r["record_id"]: r for r in rows}
    assert by_id["r1"]["title"] == ["Manufacturing consent"]
    assert by_id["r2"]["title"] == ["The fateful triangle"]
    assert by_id["r3"]["title"] is None  # omitted field -> NULL column


def test_settings_allow_duplicate_values_false(spark):
    p = Pipeline(allow_duplicate_values=False)
    p.to_field("names", extract_marc("100a", allow_duplicates=True))
    p.to_field("names", extract_marc("100a", allow_duplicates=True))
    assert p.map_record(BOOK, spark) == {"names": ["Herman, Edward S."]}


def test_plan_is_single_narrow_stage(spark):
    """The 100 TB property: the whole pipeline is one narrow select —
    no Exchange (shuffle) anywhere in the physical plan."""
    p = (
        Pipeline()
        .to_field("title", extract_marc("245ab", trim_punctuation=True))
        .to_field("author", extract_marc("100a:110a:111a"))
        .to_field("lang", extract_marc("008[35-37]"))
    )
    df = source_df(spark, ("b", BOOK))
    plan = p.apply(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- mapping_rescue (indexer.rb:483-517, doc/settings.md:35-58) -----------

def _make_poison():
    # defined per-test as a closure so cloudpickle ships it by value
    # (module-level test functions aren't importable on executors)
    def _poison(v):
        if "poison" in v:
            raise ValueError("boom")
        return v.upper()
    return _poison


def test_mapping_rescue_halt_default_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    p = Pipeline().to_field(
        "title", extract_marc("245ab"), T.transform_udf(_make_poison())
    )
    poison = dict(BOOK)
    poison = {
        **BOOK,
        "datafields": [
            {"tag": "245", "ind1": "1", "ind2": "0",
             "subfields": [{"code": "a", "value": "a poison title"}]}
        ],
    }
    with pytest.raises((Py4JJavaError, PythonException)):
        p.map_record(poison, spark)


def test_mapping_rescue_skip_quarantines(spark):
    poison = {
        **BOOK,
        "datafields": [
            {"tag": "245", "ind1": "1", "ind2": "0",
             "subfields": [{"code": "a", "value": "a poison title"}]}
        ],
    }
    p = (
        Pipeline()
        .settings(mapping_rescue="skip")
        .to_field("title", extract_marc("245a"), T.transform_udf(_make_poison()))
    )
    df = source_df(spark, ("good", BOOK), ("bad", poison))
    good, bad = p.apply_with_quarantine(df)
    good_rows = {r["record_id"]: list(r["title"]) for r in good.collect()}
    assert good_rows == {"good": ["MANUFACTURING CONSENT :"]}
    bad_rows = bad.collect()
    assert [r["record_id"] for r in bad_rows] == ["bad"]
    assert "ValueError: boom" in bad_rows[0]["_error"]
    assert "to_field ['title']" in bad_rows[0]["_error"]
    # quarantine keeps the raw source record for later re-processing
    assert bad_rows[0]["marc"]["datafields"][0]["subfields"][0]["value"] == (
        "a poison title"
    )


def test_mapping_rescue_skip_plain_apply_drops_errored(spark):
    poison = {
        **BOOK,
        "datafields": [
            {"tag": "245", "ind1": "1", "ind2": "0",
             "subfields": [{"code": "a", "value": "a poison title"}]}
        ],
    }
    p = (
        Pipeline()
        .settings(mapping_rescue="skip")
        .to_field("title", extract_marc("245a"), T.transform_udf(_make_poison()))
    )
    out = p.apply(source_df(spark, ("good", BOOK), ("bad", poison)))
    assert [r["record_id"] for r in out.collect()] == ["good"]


def test_after_processing_runs_in_order(spark):
    calls = []
    p = (
        Pipeline()
        .to_field("title", extract_marc("245ab"))
        .after_processing(lambda: calls.append("first"))
        .after_processing(lambda: calls.append("second"))
    )
    p.apply(source_df(spark, ("b", BOOK))).collect()
    p.run_after_processing()
    assert calls == ["first", "second"]


def test_load_config_file(spark, tmp_path):
    conf = tmp_path / "conf.py"
    conf.write_text(
        'to_field("title", extract_marc("245ab", trim_punctuation=True))\n'
    )
    p = Pipeline().load_config_file(str(conf))
    out = p.map_record(BOOK, spark)
    assert out["title"] == [
        "Manufacturing consent : the political economy of the mass media"
    ]


def test_nested_schema_pruning_at_scan(spark, tmp_path):
    """The 100 TB scan property: a datafield-only pipeline must prune the
    parquet ReadSchema down to marc.datafields — controlfields and leader
    stay unread (checked via the physical plan's ReadSchema)."""
    path = str(tmp_path / "marc_parquet")
    source_df(spark, ("b", BOOK)).write.parquet(path)
    df = spark.read.parquet(path)
    p = Pipeline().to_field("title", extract_marc("245a", alternate_script=False))
    plan = p.apply(df)._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, "expected a parquet scan with ReadSchema"
    schema_line = read_schema[0]
    assert "datafields" in schema_line
    assert "controlfields" not in schema_line
    assert "leader" not in schema_line


def test_process_record_lshift_buffered(spark):
    """indexer << record semantics (indexer.rb:440-449), batched into one
    flush job."""
    p = Pipeline().to_field("title", extract_marc("245a", alternate_script=False))
    p << BOOK
    p.process_record(THE_TITLE)
    written = []
    ids = []
    def sink(d):
        rows = d.collect()
        written.extend(sorted(r["title"][0] for r in rows if r["title"]))
        ids.extend(sorted(r["record_id"] for r in rows))
    p.flush_records(spark, destination=sink)
    assert len(written) == 2
    assert any(t.startswith("Manufacturing") for t in written)
    # the sink sees the records' REAL 001 ids, not synthetic placeholders
    assert ids == ["2710183", "the1"]
    # buffer cleared after flush
    assert p.flush_records(spark).count() == 0


def test_map_records_custom_and_none_id_col(spark):
    """map_records must correlate results for ANY id_col configuration
    (a custom name or None), not just the default 'record_id'."""
    p = Pipeline(id_col="my_id").to_field(
        "title", extract_marc("245a", alternate_script=False)
    )
    out = p.map_records([BOOK, THE_TITLE], spark)
    assert out[0]["title"][0].startswith("Manufacturing")
    assert out[1]["title"][0].startswith("The fateful")
    assert p.id_col == "my_id"  # restored

    p2 = Pipeline(id_col=None).to_field(
        "title", extract_marc("245a", alternate_script=False)
    )
    out2 = p2.map_record(BOOK, spark)
    assert out2["title"][0].startswith("Manufacturing")
    assert p2.id_col is None


def test_apply_does_not_mutate_source_col(spark):
    """Auto-adapting to a marc/xml column is per-call: a pipeline with a
    custom source_col must keep it after mapping a 'marc'-column frame."""
    p = Pipeline(source_col="record").to_field(
        "title", extract_marc("245a", alternate_script=False)
    )
    df = spark.createDataFrame([("r1", BOOK)], MARC_SOURCE_SCHEMA)
    assert p.apply(df).count() == 1
    assert p.source_col == "record"
    # and a frame that DOES carry the configured column still works
    df2 = df.withColumnRenamed("marc", "record")
    assert p.apply(df2).collect()[0]["title"][0].startswith("Manufacturing")


def test_quarantine_schema_stable_without_error_exprs(spark):
    """apply_with_quarantine returns the same quarantine schema whether
    or not any step registered a rescued error expression."""
    p = Pipeline(mapping_rescue="skip").to_field(
        "title", extract_marc("245a", alternate_script=False)
    )
    df = spark.createDataFrame([("r1", BOOK)], MARC_SOURCE_SCHEMA)
    good, bad = p.apply_with_quarantine(df)
    assert bad.columns == ["record_id", "_error", "marc"]
    assert bad.count() == 0 and good.count() == 1


def test_null_contribution_does_not_wipe_field(spark):
    """A NULL Column handed to ctx.add_output contributes nothing instead
    of nulling every other step's values (concat NULL propagation)."""
    from pyspark.sql import functions as F

    from traject_spark import Pipeline
    from traject_spark.macros import literal

    p = (
        Pipeline()
        .to_field("subject", literal("fromfield"))
        .each_record(lambda ctx: ctx.add_output(
            "subject", F.when(F.lit(False), F.array(F.lit("x")))
        ))
    )
    rows = p.apply(source_df(spark, BOOK)).collect()
    assert all(r["subject"] == ["fromfield"] for r in rows)


def test_ctx_output_sees_processed_values(spark):
    """ctx.output() applies the add-time invariants (nil drop, de-dup)
    like the reference's output_hash, so derived fields see the same
    view the writer will."""
    from pyspark.sql import functions as F

    from traject_spark import Pipeline

    p = (
        Pipeline()
        .settings(allow_duplicate_values=False)
        .to_field("t", lambda acc, ctx: F.concat(acc, F.array(
            F.lit("A"), F.lit("A"), F.lit(None).cast("string"))))
        .each_record(lambda ctx: ctx.add_output(
            "t_len", F.array(F.size(ctx.output("t")).cast("string"))
        ))
    )
    rows = p.apply(source_df(spark, BOOK)).collect()
    assert all(r["t"] == ["A"] and r["t_len"] == ["1"] for r in rows)


def test_map_record_field_named_like_id_col(spark):
    """to_field('id') with id_col='id' — the canonical traject shape —
    must not produce duplicate columns or crash map_record."""
    from traject_spark import Pipeline
    from traject_spark.macros import extract_marc
    from traject_spark.marc.schema import marc_record

    rec = marc_record(
        controlfields=[("001", "ctrl1")],
        datafields=[("245", "1", "0", [("a", "T")])],
    )
    p = (Pipeline(id_col="id")
         .to_field("id", extract_marc("001"))
         .to_field("title", extract_marc("245a")))
    out = p.map_record(rec, spark)
    assert out == {"id": ["ctrl1"], "title": ["T"]}


def test_parallel_compile_matches_sequential(spark, monkeypatch):
    """Speculative parallel compile is a pure build-time optimization:
    same values as the sequential pass on a pure-to_field pipeline, and
    an order-dependent pipeline (clipboard / output() / skip_when /
    rescue) trips the speculation and falls back — observable ordering
    semantics never change."""
    import os

    from traject_spark.macros import extract_marc, literal

    def mk():
        return (
            Pipeline()
            .to_field("title", extract_marc("245ab"))
            .to_field("author", extract_marc("100a"))
            .to_field("lang", extract_marc("008[35-37]"))
            .to_field("lit", literal("x"))
        )

    df = source_df(spark, ("b", BOOK))
    monkeypatch.setenv("TRAJECT_SPARK_PARALLEL_COMPILE", "0")
    seq = [r.asDict() for r in mk().apply(df).collect()]
    monkeypatch.setenv("TRAJECT_SPARK_PARALLEL_COMPILE", "1")
    par = [r.asDict() for r in mk().apply(df).collect()]
    assert seq == par and par

    # order-dependent pipeline: a later rule reads an earlier field via
    # the clipboard — must trip the speculation, not miscompile
    def stash(acc, ctx):
        ctx.clipboard["t"] = acc
        return acc

    def unstash(acc, ctx):
        return ctx.clipboard["t"]

    p = (
        Pipeline()
        .to_field("title", extract_marc("245a"), stash)
        .to_field("copy", unstash)
        .to_field("a", literal("1"))
        .to_field("b", literal("2"))
    )
    row = p.apply(df).collect()[0]
    assert row["copy"] == row["title"] and row["title"]

    # skip_when inside a to_field macro also trips (and still skips)
    from pyspark.sql import functions as F

    def skipper(acc, ctx):
        ctx.skip_when(F.lit(True))
        return acc

    p2 = (
        Pipeline()
        .to_field("t", extract_marc("245a"), skipper)
        .to_field("a", literal("1"))
        .to_field("b", literal("2"))
        .to_field("c", literal("3"))
    )
    assert p2.apply(df).count() == 0


def test_parallel_compile_pool_reentry_goes_sequential(spark):
    """A macro that compiles a sub-pipeline from inside a pool thread
    must not re-submit to the shared 8-worker pool: with >=8 outer
    rules each blocking on a nested compile, every worker would wait on
    nested f.result() submissions that can never run — deadlock (r10
    advice). The re-entry guard forces nested compiles sequential."""
    import threading

    from traject_spark.macros import literal

    nested_parallel = []

    def nested_compile(acc, ctx):
        inner = (
            Pipeline()
            .to_field("w", literal("1"))
            .to_field("x", literal("2"))
            .to_field("y", literal("3"))
            .to_field("z", literal("4"))
        )
        if threading.current_thread().name.startswith("traject-compile"):
            nested_parallel.append(inner._compile_steps_parallel())
            inner._field_exprs = {}
            inner._skip_conds = []
            inner._error_exprs = []
            inner._materialized = []
        inner.compile()
        return acc

    p = Pipeline()
    for i in range(10):
        p.to_field(f"f{i}", literal(str(i)), nested_compile)

    done = {}

    def run():
        done["fields"], _ = p.compile()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "compile deadlocked on pool re-entry"
    assert len(done["fields"]) == 10
    # the guard was actually exercised: nested attempts from pool
    # threads reported False (sequential path)
    assert nested_parallel and not any(nested_parallel)


def _forty_rule_pipeline():
    """A reference-scale 40-rule config: the flagship 12 rules (every
    semantic macro once) plus 28 plain extract_marc fields with varying
    specs/options — the shape of the reference's real-world ~40-field
    configs (index_bench/common.rb:12-136 is mostly extract_marc lines
    with the heavy semantic derivations appearing once each)."""
    from traject_spark.macros import (
        extract_all_marc_values, extract_marc, marc_formats,
        marc_geo_facet, marc_languages, marc_lcc_to_broad_category,
        marc_lcsh_formatted, marc_publication_date, marc_sortable_author,
        marc_sortable_title, oclcnum,
    )

    p = (
        Pipeline()
        .to_field("title", extract_marc("245ab", trim_punctuation=True))
        .to_field("title_sort", marc_sortable_title())
        .to_field("author", extract_marc("100a:110a:111a"))
        .to_field("author_sort", marc_sortable_author())
        .to_field("language", marc_languages())
        .to_field("oclc", oclcnum())
        .to_field("lcc_category", marc_lcc_to_broad_category())
        .to_field("subject", marc_lcsh_formatted())
        .to_field("geo", marc_geo_facet())
        .to_field("format", marc_formats())
        .to_field("pub_date", marc_publication_date())
        .to_field("all_text", extract_all_marc_values())
    )
    extra_specs = [
        "246ab", "130a", "240a", "250a", "260abc", "264abc", "300a",
        "490av", "500a", "505a", "520a", "600abcdq", "610ab", "611a",
        "630a", "650ax", "651a", "655a", "700abcd", "710ab", "711a",
        "730a", "740a", "830a", "020a", "022a", "035a", "001",
    ]
    for i, spec in enumerate(extra_specs):
        p.to_field(
            f"f{i}_{spec.replace('[', '_').replace(']', '')}",
            extract_marc(spec, trim_punctuation=(i % 3 == 0)),
        )
    return p


def test_parallel_compile_40_rules_identical_trees(spark, monkeypatch):
    """(a) the speculative parallel compile of a reference-scale 40-rule
    config produces EXPRESSION-IDENTICAL trees to the sequential path
    (str(Column) equality up to alpha-renaming: Spark's lambda-variable
    counter is a global JVM sequence, so the literal x_<n> numbering
    differs by compile order even between two sequential compiles —
    canonicalize by order of first appearance before comparing)."""
    import re
    import time

    def canon(col) -> str:
        s = str(col)
        seen: dict = {}
        return re.sub(
            r"\b[a-z]_\d+\b",
            lambda m: seen.setdefault(m.group(0), f"v{len(seen)}"),
            s,
        )

    monkeypatch.setenv("TRAJECT_SPARK_PARALLEL_COMPILE", "0")
    seq_fields, seq_skip = _forty_rule_pipeline().compile()
    monkeypatch.setenv("TRAJECT_SPARK_PARALLEL_COMPILE", "1")
    t0 = time.monotonic()
    par_fields, par_skip = _forty_rule_pipeline().compile()
    build = time.monotonic() - t0
    assert len(par_fields) == len(seq_fields) == 40
    assert [n for n, _ in par_fields] == [n for n, _ in seq_fields]
    for (n, se), (_, pe) in zip(seq_fields, par_fields):
        assert canon(se) == canon(pe), f"tree drift in field {n}"
    assert seq_skip is None and par_skip is None
    # bench note: 40-rule parallel build time (r10 floor ~2-4s on a
    # qualified window; generous bound, min absorbs host stalls)
    assert build < 60, build


def test_parallel_compile_40_rules_clipboard_forces_sequential(spark):
    """(b) a clipboard-touching rule ANYWHERE in the 40-rule list trips
    the speculation and the whole pipeline compiles sequentially (the
    compiled output is order-exact either way — asserted via the
    clipboard actually carrying the earlier field's value)."""
    from traject_spark.macros import literal

    def stash(acc, ctx):
        ctx.clipboard["t"] = acc
        return acc

    def unstash(acc, ctx):
        return ctx.clipboard["t"]

    p = _forty_rule_pipeline()
    p.to_field("stashed", literal("X"), stash)
    p.to_field("copy", unstash)
    from tests.fixtures import BOOK
    from tests.test_pipeline import source_df

    row = p.apply(source_df(spark, ("b", BOOK))).collect()[0]
    assert row["copy"] == ["X"] and row["stashed"] == ["X"]
