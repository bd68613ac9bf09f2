#!/usr/bin/env python
"""One-off probe: per-field cost of the full mapping pipeline."""
import os
import sys
import time

from pyspark.sql import SparkSession

import bench

MEM = os.environ.get("PROBE_MEM", "24g")


def main():
    b = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName("field-probe")
        .config("spark.driver.memory", MEM)
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", "16m")
    )
    flags = os.environ.get("PROBE_JVMFLAGS", "")
    if flags:
        b = b.config("spark.driver.extraJavaOptions", flags)
    spark = b.getOrCreate()

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
    # warmup full
    bench._full_pipeline().apply(src).write.mode("overwrite").format(
        "noop"
    ).save()

    def run_one(fields, label):
        p = Pipeline()
        for name, mk in fields:
            p = p.to_field(name, mk())
        spark._jvm.System.gc()
        best = None
        for _ in range(2):
            t0 = time.time()
            p.apply(src).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"FIELD {label}: {best:.2f}s", file=sys.stderr)

    run_one(FIELDS, "ALL12")
    for f in FIELDS:
        run_one([f], f[0])
    spark.stop()


if __name__ == "__main__":
    main()
