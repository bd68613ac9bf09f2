#!/usr/bin/env python
"""r16 probe: map_full_pipeline cost decomposition — BUILD (driver-side
compile) vs EXEC (cluster execution, noop sink), per field and FULL.

The r15 probe (bench_field_probe.py) timed compile+exec together, which
made per-field costs look additive partly because each single-field
probe paid its own compile. This one separates them:

  BUILD  <name>: median-of-3 fresh Pipeline().compile() wall time
  EXEC   <name>: min over N apply+noop runs of a PRE-COMPILED plan
                 (the DataFrame is built once, outside the timed loop)

Run: python tools/probe_mapfull_r16.py [N_exec_runs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    spark = bench.session()

    from traject_spark import Pipeline
    from traject_spark.macros import (
        extract_all_marc_values, extract_marc, marc_formats, marc_geo_facet,
        marc_languages, marc_lcc_to_broad_category, marc_lcsh_formatted,
        marc_publication_date, marc_sortable_author, marc_sortable_title,
        oclcnum,
    )

    FIELDS = [
        ("title", lambda: extract_marc("245ab", trim_punctuation=True)),
        ("title_sort", marc_sortable_title),
        ("author", lambda: extract_marc("100a:110a:111a")),
        ("author_sort", marc_sortable_author),
        ("language", marc_languages),
        ("oclc", oclcnum),
        ("lcc_category", marc_lcc_to_broad_category),
        ("subject", marc_lcsh_formatted),
        ("geo", marc_geo_facet),
        ("format", marc_formats),
        ("pub_date", marc_publication_date),
        ("all_text", extract_all_marc_values),
    ]

    src = bench.synth_marc(spark)
    # warmup (scan cache warm, JIT)
    bench._full_pipeline().apply(src).write.mode("overwrite").format(
        "noop"
    ).save()

    def probe(fields, label):
        # BUILD: median-of-3 fresh compiles
        builds = []
        for _ in range(3):
            p = Pipeline()
            for name, mk in fields:
                p = p.to_field(name, mk())
            t0 = time.time()
            p.compile()
            builds.append(time.time() - t0)
        builds.sort()
        # EXEC: pre-built DataFrame, min over N noop runs
        p = Pipeline()
        for name, mk in fields:
            p = p.to_field(name, mk())
        out = p.apply(src)
        runs = []
        for _ in range(N):
            spark._jvm.System.gc()
            t0 = time.time()
            out.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
        print(
            f"PROBE {label}: build_med={builds[1]:.3f}s "
            f"exec_min={min(runs):.3f}s exec_runs="
            f"{[round(r, 2) for r in runs]}",
            file=sys.stderr,
            flush=True,
        )

    probe(FIELDS, "ALL12")
    for f in FIELDS:
        probe([f], f[0])
    probe(FIELDS, "ALL12_again")
    # scan-only control: how much of a single-field probe is the scan
    t0 = time.time()
    src.select("record_id").write.mode("overwrite").format("noop").save()
    print(f"PROBE scan_id_only: {time.time() - t0:.3f}s", file=sys.stderr)
    t0 = time.time()
    src.write.mode("overwrite").format("noop").save()
    print(f"PROBE scan_full: {time.time() - t0:.3f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
