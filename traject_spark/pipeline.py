"""Pipeline: the traject Indexer re-expressed as a Spark plan compiler.

The reference interprets an ordered list of step objects per record on a
thread pool (lib/traject/indexer.rb:348-355,531-619).  Here, the same DSL
*compiles*: each ``to_field`` rule becomes one Column expression (macros
composed over a fresh accumulator), the whole pipeline becomes ONE
``select`` + optional ``filter`` — a single narrow stage with no shuffle,
executed by Catalyst/Tungsten with whole-stage codegen.  Thread pools,
bounded queues and backpressure (lib/traject/thread_pool.rb) disappear into
Spark task parallelism.

Fidelity notes (SURVEY §4 traps):
- output post-processing per add_output: drop nil values, omit empty
  fields, optional de-dup — lib/traject/indexer/context.rb:117-129 with
  defaults at lib/traject/indexer.rb:293-296;
- multiple ``to_field`` calls on one name concatenate in registration
  order; de-dup (when enabled) applies to the accumulated whole;
- ``skip!`` means the record produces *nothing* — compiled to a final
  ``filter`` (lib/traject/indexer.rb:591-595).
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from traject_spark.expr import let
from traject_spark.marc.schema import MARC_SOURCE_SCHEMA

_EMPTY = "array<string>"

#: shared worker pool for speculative parallel compilation. Module-level
#: and lazily created: with Py4J's pinned-thread mode each Python thread
#: owns a JVM connection, so a per-compile pool would leak connections.
_COMPILE_POOL = None
_COMPILE_POOL_LOCK = threading.Lock()


def _compile_pool():
    global _COMPILE_POOL
    with _COMPILE_POOL_LOCK:
        if _COMPILE_POOL is None:
            from concurrent.futures import ThreadPoolExecutor

            _COMPILE_POOL = ThreadPoolExecutor(
                max_workers=8, thread_name_prefix="traject-compile"
            )
    return _COMPILE_POOL


def _concat_contributions(exprs: list) -> Column:
    """Combine one field's per-step contributions.

    Each contribution is coalesced to the empty array first: a NULL
    contribution means "this step adds nothing" (the reference's
    add_output just skips nil values, context.rb:117-129) — but
    F.concat over arrays returns NULL if ANY argument is NULL, so one
    nullable Column handed to ctx.add_output would otherwise silently
    wipe every other step's values for the field.
    """
    if len(exprs) == 1:
        # single contribution: NULL already flows to the omit-if-empty
        # rule (field absent), same outcome as coalesce+concat
        return exprs[0]
    empty = F.array().cast(_EMPTY)
    return F.concat(*[F.coalesce(e, empty) for e in exprs])


class PipelineContext:
    """Per-compilation context handed to macros and each_record steps.

    The reference Context carries source_record / output_hash / clipboard /
    skip (lib/traject/indexer/context.rb:7-43); here those become: the
    source struct Column, the field-expression table, a dict of named
    intermediate Columns, and accumulated skip predicates.
    """

    def __init__(self, pipeline: "Pipeline"):
        self._pipeline = pipeline
        self.clipboard: dict[str, Column] = {}
        self.current_step: Optional[str] = None

    @property
    def marc(self) -> Column:
        return F.col(self._pipeline.source_col)

    # alias for non-MARC pipelines
    @property
    def record(self) -> Column:
        return F.col(self._pipeline.source_col)

    def output(self, name: str) -> Column:
        """Expression for field ``name`` as accumulated so far, with the
        add_output invariants already applied (nil drop / de-dup per
        settings) — the reference's output_hash holds the PROCESSED
        values at read time (context.rb:117-129 runs compact/uniq as
        values arrive), so a later step keying on an earlier field's
        size or content must see the same view the writer will.
        (Lets later steps read earlier fields,
        doc/indexing_rules.md:210-257.)"""
        exprs = self._pipeline._field_exprs.get(name)
        if not exprs:
            return F.array().cast(_EMPTY)
        # add-time invariants only: the omit-if-empty rule ([] -> NULL)
        # is a write-time concern — a reader doing size()/exists() over
        # an empty field must see [], not NULL
        out = F.coalesce(
            _concat_contributions(exprs), F.array().cast(_EMPTY)
        )
        s = self._pipeline.settings_dict
        if not s.get("allow_nil_values", False):
            out = F.filter(out, lambda x: x.isNotNull())
        if not s.get("allow_duplicate_values", True):
            out = F.array_distinct(out)
        return out

    def add_output(self, name: str, values: Column) -> None:
        """each_record-style write to any output field
        (lib/traject/indexer/context.rb:117-129)."""
        self._pipeline._add_field_expr(name, values)

    def skip_when(self, cond: Column) -> None:
        """context.skip! analog (lib/traject/indexer/context.rb:35-43)."""
        self._pipeline._skip_conds.append(cond)

    @property
    def rescue_mode(self) -> str:
        """The ``mapping_rescue`` setting (doc/settings.md:35-58):
        ``halt`` (default — errors abort the job, the reference's
        log+re-raise) or ``skip`` (errored records are quarantined out,
        the reference's ``context.skip!``-in-handler pattern)."""
        return str(self._pipeline.settings_dict.get("mapping_rescue", "halt"))

    def materialize(self, expr: Column, hint: str = "mat") -> Column:
        """Register ``expr`` to be computed ONCE as a hidden column before
        the pipeline's filters/select, returning a reference to it.

        This is how a rescued UDF avoids double evaluation: its
        (value, error) struct lands in one ``withColumns`` projection and
        both the error filter and the field projection reference the
        materialized attribute instead of re-embedding the UDF call
        (Catalyst's filter pushdown / projection collapse would otherwise
        re-inline the expression into BOTH consumers)."""
        name = f"__traject_{hint}_{len(self._pipeline._materialized)}__"
        self._pipeline._materialized.append((name, expr))
        return F.col(name)

    def record_error(self, err: Column) -> None:
        """Report a per-record error Column (null = ok) from a rescued
        step; the pipeline routes errored records per ``mapping_rescue``
        (indexer.rb:483-517 handle_mapping_errors)."""
        if self.current_step:
            err = F.when(
                err.isNotNull(),
                F.concat(
                    err, F.lit(f" (while executing {self.current_step})")
                ),
            )
        self._pipeline._error_exprs.append(err)


class _SpeculativeAccess(BaseException):
    """Raised when a to_field macro touches ORDER-DEPENDENT shared state
    during a speculative parallel compile — the signal to throw the
    parallel attempt away and recompile sequentially. BaseException, not
    Exception, so a macro's own ``except Exception`` rescue cannot
    swallow the tripwire and let an order-dependent result escape."""


class _TripwireClipboard(dict):
    """Clipboard stand-in for speculative compiles: ANY access aborts
    the parallel attempt (clipboard is the documented cross-step
    channel, so reads and writes are both ordering-dependent)."""

    def _trip(self, *a, **k):
        raise _SpeculativeAccess("clipboard")

    __getitem__ = __setitem__ = __delitem__ = __contains__ = _trip
    __iter__ = __len__ = __or__ = __ror__ = __ior__ = __eq__ = _trip
    get = setdefault = pop = popitem = update = clear = _trip
    keys = values = items = copy = _trip


class _SpeculativeContext(PipelineContext):
    """PipelineContext for speculative parallel compilation of ONE
    to_field step. Pure expression building (ctx.marc/ctx.record,
    settings reads) proceeds; every order-dependent channel — clipboard,
    reading/writing other fields, skip conditions, materialization,
    error registration — raises :class:`_SpeculativeAccess`, which the
    compiler turns into a sequential recompile. Results from a tripped
    attempt are never used, so a partially-built expression is
    harmless garbage."""

    def __init__(self, pipeline: "Pipeline"):
        super().__init__(pipeline)
        self.clipboard = _TripwireClipboard()

    def output(self, name: str) -> Column:
        raise _SpeculativeAccess("output")

    def add_output(self, name: str, values: Column) -> None:
        raise _SpeculativeAccess("add_output")

    def skip_when(self, cond: Column) -> None:
        raise _SpeculativeAccess("skip_when")

    def materialize(self, expr: Column, hint: str = "mat") -> Column:
        raise _SpeculativeAccess("materialize")

    def record_error(self, err: Column) -> None:
        raise _SpeculativeAccess("record_error")


class Pipeline:
    """Ordered to_field / each_record rule set compiling to one select."""

    def __init__(
        self,
        source_col: str = "marc",
        id_col: Optional[str] = "record_id",
        **settings,
    ):
        self.source_col = source_col
        self.id_col = id_col
        # defaults per lib/traject/indexer.rb:293-296
        self.settings_dict = {
            "allow_nil_values": False,
            "allow_empty_fields": False,
            "allow_duplicate_values": True,
        }
        self.settings_dict.update(settings)
        self._steps: list = []
        self._after_processing: list[Callable] = []
        # compile state
        self._field_exprs: dict[str, list[Column]] = {}
        self._skip_conds: list[Column] = []
        self._error_exprs: list[Column] = []
        self._materialized: list[tuple[str, Column]] = []

    # -- DSL ---------------------------------------------------------------
    def settings(self, **kwargs) -> "Pipeline":
        self.settings_dict.update(kwargs)
        return self

    def provide(self, key: str, value) -> "Pipeline":
        """First-set-wins write mode (lib/traject/indexer/settings.rb:23-96)."""
        self.settings_dict.setdefault(key, value)
        return self

    def to_field(
        self,
        field_name: Union[str, Sequence[str]],
        *macros: Callable[[Column, PipelineContext], Column],
    ) -> "Pipeline":
        names = [field_name] if isinstance(field_name, str) else list(field_name)
        for n in names:
            if not isinstance(n, str) or not n:
                raise ValueError(f"to_field needs a non-empty string field name, got {n!r}")
        self._steps.append(("to_field", names, macros))
        return self

    def each_record(self, fn: Callable[[PipelineContext], None]) -> "Pipeline":
        self._steps.append(("each_record", fn))
        return self

    def load_config_file(self, path: str) -> "Pipeline":
        """Execute a traject-style Python config file against this
        pipeline (indexer.rb:388-406 load_config_file): the file runs
        with ``to_field``/``each_record``/``settings``/every macro in
        scope — same loader the CLI uses."""
        from traject_spark.cli import load_config_files

        load_config_files(self, [path])
        return self

    def after_processing(self, fn: Callable[[], None]) -> "Pipeline":
        """Register a post-run callback (lib/traject/indexer.rb:359-361);
        callbacks run in registration order after the sink finishes
        (indexer.rb:646-655), e.g. a Solr commit or cleanup."""
        self._after_processing.append(fn)
        return self

    def run_after_processing(self) -> None:
        """Invoke registered callbacks; called by ``process_with`` and the
        CLI after the write completes, or manually after ``apply`` +
        custom sink."""
        for fn in self._after_processing:
            fn()

    # -- compilation -------------------------------------------------------
    def _add_field_expr(self, name: str, expr: Column) -> None:
        self._field_exprs.setdefault(name, []).append(expr)

    def _post_process(self, acc: Column) -> Column:
        """add_output invariants (context.rb:117-129): drop nils, then
        de-dup (when allow_duplicate_values=False), then omit-if-empty
        (=> NULL column; writers drop nulls)."""
        out = acc
        if not self.settings_dict.get("allow_nil_values", False):
            out = F.filter(out, lambda x: x.isNotNull())
        if not self.settings_dict.get("allow_duplicate_values", True):
            out = F.array_distinct(out)
        if not self.settings_dict.get("allow_empty_fields", False):
            # let-bind: the naive when(size(out)>0, out) would copy the
            # entire accumulated field expression twice
            out = let(out, lambda o: F.when(F.size(o) > 0, o))
        return out

    def compile(self) -> tuple[list[tuple[str, Column]], Optional[Column]]:
        """Run every step once, building the field-expression table.

        Returns ([(field_name, final Column)], skip_condition_or_None).

        Expression building is driver-side Py4J traffic — the flagship
        12-rule pipeline is ~18k round trips (~4.5s), comparable to
        EXECUTING it over 600k rows — and it is latency-bound (socket
        waits release the GIL). When every step is an independent
        ``to_field``, the steps compile SPECULATIVELY in parallel on a
        small thread pool; any step that touches an order-dependent
        channel (clipboard, other fields, skip!, materialize/rescue)
        trips :class:`_SpeculativeAccess` and the whole pipeline
        recompiles sequentially, so the COMPILED EXPRESSIONS are
        order-exact in every case. Caveat: on a tripped attempt the
        non-tripping macros ran once speculatively and run again
        sequentially — a macro with Python-level side effects beyond
        the ctx (logging, module-level counters) observes two
        invocations per compile; keep macros pure w.r.t. everything but
        ctx, or disable with ``TRAJECT_SPARK_PARALLEL_COMPILE=0``.
        Results merge in registration order either way.
        """
        self._field_exprs = {}
        self._skip_conds = []
        self._error_exprs = []
        self._materialized = []
        if not self._compile_steps_parallel():
            self._compile_steps_sequential()

        fields = []
        for name, exprs in self._field_exprs.items():
            raw = _concat_contributions(exprs)
            fields.append((name, self._post_process(raw).alias(name)))
        return fields, self._skip_condition()

    def _skip_condition(self) -> Optional[Column]:
        """OR-fold of the registered skip! predicates — ONE definition
        (compile and process_with both need it; two inline folds had
        already started to drift)."""
        skip = None
        for cond in self._skip_conds:
            skip = cond if skip is None else (skip | cond)
        return skip

    def _compile_steps_sequential(self) -> None:
        ctx = PipelineContext(self)
        for step in self._steps:
            if step[0] == "to_field":
                _, names, macros = step
                ctx.current_step = f"to_field {names}"
                acc = F.array().cast(_EMPTY)
                for macro in macros:
                    acc = macro(acc, ctx)
                for n in names:
                    self._add_field_expr(n, acc)
            else:
                _, fn = step
                ctx.current_step = "each_record"
                fn(ctx)
        ctx.current_step = None

    def _compile_steps_parallel(self) -> bool:
        """Try the speculative parallel compile; True on success.

        Eligible only when the pipeline is PURE to_field steps (an
        each_record between rules is an ordering barrier by contract)
        and big enough for the pool to pay for itself. Any tripwire or
        macro error abandons the attempt — errors then re-raise from the
        sequential pass with the reference's step ordering intact."""
        if os.environ.get("TRAJECT_SPARK_PARALLEL_COMPILE", "1") == "0":
            return False
        # re-entry guard: a macro that compiles a sub-pipeline from
        # inside a pool thread would re-submit to the same 8-worker pool
        # and can deadlock once every worker blocks on a nested
        # f.result() — nested compiles go sequential
        if threading.current_thread().name.startswith("traject-compile"):
            return False
        if len(self._steps) < 4 or any(
            s[0] != "to_field" for s in self._steps
        ):
            return False

        def build(step):
            _, names, macros = step
            ctx = _SpeculativeContext(self)
            ctx.current_step = f"to_field {names}"
            acc = F.array().cast(_EMPTY)
            for macro in macros:
                acc = macro(acc, ctx)
            return acc

        futures = [
            _compile_pool().submit(build, step) for step in self._steps
        ]
        try:
            results = [f.result() for f in futures]
        except (_SpeculativeAccess, Exception):
            # tripwire or macro error: wait out the stragglers (their
            # half-built expressions are garbage either way), then let
            # the sequential pass produce the result — or re-raise the
            # error — with exact step ordering. ONLY these two: a
            # KeyboardInterrupt/SystemExit in the main thread must
            # abort the job, not silently restart compilation
            for f in futures:
                f.cancel()
                if not f.cancelled():
                    try:
                        f.result()
                    except (_SpeculativeAccess, Exception):
                        pass
            return False
        for step, acc in zip(self._steps, results):
            for n in step[1]:
                self._add_field_expr(n, acc)
        return True

    # -- execution ---------------------------------------------------------
    def apply(
        self,
        df: DataFrame,
        keep: Optional[Sequence[str]] = None,
        keep_source: bool = False,
    ) -> DataFrame:
        """Compile and apply: one narrow select (+ skip filter)."""
        prev_source = self.source_col
        # adapt PER CALL — restored afterwards so a later apply() on a
        # frame that does carry the configured column is unaffected
        self.source_col = self._adapted_source(df)
        try:
            fields, skip = self.compile()
            cols: list[Column] = []
            field_names = {n for n, _ in fields}
            # a to_field named like the id column wins (the reference's
            # document id IS output_hash['id'] when mapped): emitting
            # both would duplicate the column name and break asDict()/
            # writers downstream
            if (
                self.id_col
                and self.id_col in df.columns
                and self.id_col not in field_names
            ):
                cols.append(F.col(self.id_col))
            for k in keep or []:
                cols.append(F.col(k))
            if keep_source:
                cols.append(F.col(self.source_col))
            cols.extend(expr for _, expr in fields)
            out = df
            if self._materialized:
                # one projection computes every registered expression
                # (rescued-UDF structs) exactly once; the hidden columns
                # never appear in the final select below. Columns ALREADY
                # present on df are reused, not recomputed — this is how
                # apply_with_quarantine shares one evaluation between the
                # good and bad plans (it pre-materializes them on a
                # checkpointed base; names are deterministic per compile)
                missing = {
                    n: e for n, e in self._materialized
                    if n not in df.columns
                }
                if missing:
                    out = out.withColumns(missing)
            if skip is not None:
                # skip! => record produces nothing (indexer.rb:591-595)
                out = out.filter(~F.coalesce(skip, F.lit(False)))
            err = self._error_col()
            if err is not None and self.settings_dict.get("mapping_rescue") == "skip":
                # rescued-step errors quarantine the record out of the output
                # (doc/settings.md:35-58 skip!-in-handler); use
                # apply_with_quarantine to also capture the errored rows
                out = out.filter(err.isNull())
            return out.select(*cols)
        finally:
            self.source_col = prev_source

    process = apply  # reference naming (indexer.rb:531)

    def _adapted_source(self, df: DataFrame) -> str:
        """The record column to read from ``df``: the configured
        source_col, else 'marc'/'xml' when exactly one is present (the
        two indexer flavors, marc_indexer.rb / nokogiri_indexer.rb,
        differ only in record column)."""
        if self.source_col in df.columns:
            return self.source_col
        present = [c for c in ("marc", "xml") if c in df.columns]
        return present[0] if len(present) == 1 else self.source_col

    def _error_col(self) -> Optional[Column]:
        if not self._error_exprs:
            return None
        e = self._error_exprs[0]
        for nxt in self._error_exprs[1:]:
            e = F.coalesce(e, nxt)
        return e

    def apply_with_quarantine(
        self,
        df: DataFrame,
        keep: Optional[Sequence[str]] = None,
        return_base: bool = False,
    ):
        """``apply`` + the errored rows as a second DataFrame.

        The quarantine frame carries the record id, the first error
        message, and the raw source record (so poisoned records can be
        re-processed after a fix) — the production shape of the
        reference's custom ``mapping_rescue`` handler that logs and
        skips (doc/settings.md:35-58). Requires
        ``settings(mapping_rescue="skip")``.

        ``return_base=True`` additionally returns the frame BOTH outputs
        were computed from (the checkpointed hidden-column base when the
        pipeline materializes, else ``df``) — process_with's on_skipped
        classification must read the SAME evaluation of any
        nondeterministic rescued UDF, not a third one.
        """
        if self.settings_dict.get("mapping_rescue") != "skip":
            raise ValueError(
                'apply_with_quarantine requires settings(mapping_rescue="skip")'
            )
        good = self.apply(df, keep=keep)
        if self._materialized:
            # the good and bad outputs are SEPARATE plans: without a
            # shared materialization, a nondeterministic rescued UDF
            # (e.g. a transiently-failing network call) could error in
            # the good-plan run yet succeed in the bad-plan run — the
            # record vanishing from BOTH frames. A lazy local checkpoint
            # of the hidden columns evaluates the UDFs once on the first
            # action and both frames read the persisted result. (Driver+
            # executor storage holds one copy of df + the structs; on a
            # cluster with executor churn prefer a reliable checkpoint
            # dir upstream.)
            base = df.withColumns(
                dict(self._materialized)
            ).localCheckpoint(eager=False)
            good = self.apply(base, keep=keep)
            df = base
        err = self._error_col()
        # one quarantine schema for BOTH paths (zero registered error
        # exprs vs some): id col (when configured and present) + keep
        # cols + _error + source — so unions/writers downstream see a
        # stable shape, and id_col=None never aliases a None name
        cols: list[Column] = []
        if self.id_col and self.id_col in df.columns:
            cols.append(F.col(self.id_col))
        for k in keep or []:
            cols.append(F.col(k))
        cols.append(
            (err if err is not None else F.lit(None).cast("string"))
            .alias("_error")
        )
        cols.append(F.col(self._adapted_source(df)))
        # missing-only: when df is the checkpointed base from above, the
        # hidden columns are already present and must be REUSED (a plain
        # withColumns would overwrite them with the expressions and
        # re-evaluate the UDFs, defeating the shared checkpoint)
        missing = {
            n: e for n, e in self._materialized if n not in df.columns
        }
        base = df.withColumns(missing) if missing else df
        bad = base.select(*cols).filter(F.col("_error").isNotNull())
        if return_base:
            return good, bad, df
        return good, bad

    def process_with(
        self,
        df: DataFrame,
        destination: Optional[Callable[[DataFrame], None]] = None,
        rescue_with=None,
        on_skipped: Optional[Callable[[DataFrame], None]] = None,
        run_after_processing: bool = True,
    ) -> DataFrame:
        """Programmatic processing entry (indexer.rb:700-744), re-shaped
        for Spark: the reference's per-record callbacks become DataFrame
        callbacks (a driver-side per-record loop is the anti-scale shape).

        - ``destination``: callable given the mapped output DataFrame —
          the writer (e.g. ``lambda out: write_json(out, path)``);
        - ``rescue_with``: ``"skip"`` quarantines errored records
          silently; a callable additionally receives the quarantine
          DataFrame (record_id, _error, source record). ``None`` = halt
          on error, the reference default;
        - ``on_skipped``: callable given the records removed by ``skip!``
          predicates (indexer.rb:735 on_skipped.call);
        - ``after_processing`` callbacks run at the end
          (indexer.rb:646-655).

        Returns the mapped output DataFrame.
        """
        prev = self.settings_dict.get("mapping_rescue")
        if rescue_with is not None:
            self.settings_dict["mapping_rescue"] = "skip"
        try:
            if callable(rescue_with):
                good, bad, base = self.apply_with_quarantine(
                    df, return_base=True
                )
                rescue_with(bad)
            else:
                good = self.apply(df)
                base = df
                if on_skipped is not None and self._materialized:
                    # share ONE evaluation of the nondeterministic
                    # rescued-UDF columns between the output and the
                    # skip classification (the apply_with_quarantine
                    # mechanism): recomputing them per frame could land
                    # a record in none/two of the frames when a UDF
                    # fails transiently
                    base = df.withColumns(
                        dict(self._materialized)
                    ).localCheckpoint(eager=False)
                    good = self.apply(base)
            if on_skipped is not None:
                skip = self._skip_condition()
                # skip predicates compiled under rescue mode may
                # reference the materialized hidden columns — base
                # carries them (checkpointed, so this is the SAME
                # evaluation the good/bad frames read); the callback
                # gets the ORIGINAL input shape back
                if skip is not None:
                    on_skipped(
                        base.filter(F.coalesce(skip, F.lit(False)))
                        .select(*df.columns)
                    )
                else:
                    on_skipped(df.filter(F.lit(False)))
            if destination is not None:
                destination(good)
            if run_after_processing:
                self.run_after_processing()
            return good
        finally:
            if rescue_with is not None:
                if prev is None:
                    self.settings_dict.pop("mapping_rescue", None)
                else:
                    self.settings_dict["mapping_rescue"] = prev

    def process_record(self, record: dict) -> "Pipeline":
        """``indexer.process_record(record)`` / ``indexer << record``
        (indexer.rb:440-449): buffer one record for the configured sink.

        The reference writes each record through immediately; per-record
        job launch is the anti-scale shape on Spark, so records buffer
        driver-side and ``flush_records`` maps the batch in ONE job.
        """
        self._record_buffer: list = getattr(self, "_record_buffer", [])
        self._record_buffer.append(record)
        return self

    __lshift__ = process_record  # indexer << record (indexer.rb:448-449)

    def flush_records(
        self,
        spark: SparkSession,
        destination: Optional[Callable[[DataFrame], None]] = None,
    ) -> DataFrame:
        """Map all buffered ``process_record`` records as one job; send
        the output to ``destination`` (the writer) if given; clear the
        buffer. Returns the mapped DataFrame.

        Record ids come from the record's own 001 control field (what the
        reference's writers persist as the document id); records with no
        001 fall back to a positional ``__r{i}__`` placeholder."""
        from traject_spark.marc.io import _id_from

        records = getattr(self, "_record_buffer", [])
        rows = [
            (
                (_id_from(rec, "001") if rec.get("controlfields") else None)
                or f"__r{i}__",
                rec,
            )
            for i, rec in enumerate(records)
        ]
        df = spark.createDataFrame(rows, schema=MARC_SOURCE_SCHEMA)
        # honor a non-default id_col, like map_records: the schema names
        # the id 'record_id', but apply() only carries the id through
        # when it is named self.id_col — without the rename a configured
        # Pipeline(id_col='id') would emit NO id column at all
        if self.id_col and self.id_col != "record_id":
            df = df.withColumnRenamed("record_id", self.id_col)
        out = self.apply(df)
        if destination is not None:
            destination(out)
        self._record_buffer = []
        return out

    def map_record(self, record: dict, spark: SparkSession) -> dict:
        """Single-record correctness entry point, mirroring
        Indexer#map_record (lib/traject/indexer.rb:429-433): returns the
        output_hash as {field: [values]} with omitted fields absent.
        """
        out = self.map_records([record], spark)
        return out[0] if out else {}

    def map_records(self, records: Sequence[dict], spark: SparkSession) -> list[dict]:
        """Batch variant of map_record: ONE Spark job for N records,
        preserving input order. Skipped records come back as {}.

        Works for ANY id_col configuration: the synthetic positional ids
        ride whatever id column the pipeline is configured with (renamed
        from MARC_SOURCE_SCHEMA's record_id), and a pipeline with
        id_col=None is correlated through a temporary id column so the
        positional mapping never silently returns {}.
        """
        rows = [(f"__r{i}__", rec) for i, rec in enumerate(records)]
        df = spark.createDataFrame(rows, schema=MARC_SOURCE_SCHEMA)
        # reserved name: the positional row id must never collide with a
        # to_field name (a pipeline with id_col='id' AND to_field('id')
        # is the canonical traject shape — the mapped field would win in
        # apply() and the positional correlation would break)
        id_name = "__traject_rowid__"
        df = df.withColumnRenamed("record_id", id_name)
        prev_id_col = self.id_col
        self.id_col = id_name
        try:
            collected = self.apply(df).collect()
        finally:
            self.id_col = prev_id_col
        by_id = {}
        for row in collected:
            d = row.asDict()
            rid = d.pop(id_name, None)
            by_id[rid] = {k: list(v) for k, v in d.items() if v is not None}
        return [by_id.get(f"__r{i}__", {}) for i in range(len(records))]
