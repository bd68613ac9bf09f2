#!/usr/bin/env python
"""r15 ingest-lane decomposition A/B (guide §1.1, §4.1).

Question: the off-Spark profile reads the pure-Python parse at only
~56 us/rec for NDJSON (= ~1.0s of 32-core time for 600k records), yet the
`ingest_ndjson` lane runs 4.7-6.2s. Where do the other ~4s go — the text
scan, the Python-boundary machinery, or shipping the nested struct column
back through Arrow and converting it to JVM rows?

Method: same session config as bench.py, 600k-record NDJSON fixture,
noop sink, N interleaved passes per variant, min + median reported.

Variants:
  scan_only      spark.read.text(path)                        (JVM only)
  boundary_id    mapInPandas: full parse, emit record_id ONLY (no struct
                 through Arrow; isolates parse + boundary-in cost)
  full           read_marc_json (production)                  (struct out)
  full_arrow     like full but mapInArrow emitting pyarrow RecordBatches
                 directly (skips the pandas wrapper on the way out)

Interpretation: full - boundary_id = cost of the struct column crossing
Arrow + JVM row conversion; boundary_id - scan_only = parse + line
batches crossing into Python.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

NDJ = "/tmp/ab_ingest_ndj"
RECORDS = 600_000


def build_fixture(spark) -> None:
    if os.path.isdir(NDJ):
        return
    src = "/tmp/profix/recs.ndj"  # 20k records from make_profix
    if not os.path.exists(src):
        raise SystemExit("run /tmp/make_profix.py first")
    os.makedirs(NDJ)
    lines = open(src).read()
    reps = RECORDS // 20_000
    with open(f"{NDJ}/part-00000.ndj", "w") as fh:
        for _ in range(reps):
            fh.write(lines)


def v_scan_only(spark):
    bench.noop(spark.read.text(NDJ))


def v_boundary_id(spark):
    from traject_spark.marc.serialize import from_marc_in_json
    from traject_spark.marc.io import _id_from

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            ids = []
            for line in pdf["value"]:
                if not line or not line.strip():
                    continue
                try:
                    rec = from_marc_in_json(line)
                except (json.JSONDecodeError, AttributeError, TypeError,
                        KeyError, ValueError):
                    continue
                ids.append(_id_from(rec, "001"))
            yield pd.DataFrame({"record_id": ids})

    bench.noop(
        spark.read.text(NDJ).mapInPandas(parse, "record_id string")
    )


def v_full(spark):
    from traject_spark.marc.io import read_marc_json

    bench.noop(read_marc_json(spark, NDJ))


def v_full_arrow(spark):
    """read_marc_json but emitting Arrow batches directly (no pandas)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type
    from traject_spark.marc.schema import MARC_SOURCE_SCHEMA
    from traject_spark.marc.serialize import from_marc_in_json
    from traject_spark.marc.io import _id_from

    out_type = to_arrow_type(MARC_SOURCE_SCHEMA)

    def parse(batches):
        for batch in batches:
            ids, recs = [], []
            for line in batch.column(0).to_pylist():
                if not line or not line.strip():
                    continue
                try:
                    rec = from_marc_in_json(line)
                except (json.JSONDecodeError, AttributeError, TypeError,
                        KeyError, ValueError):
                    continue
                ids.append(_id_from(rec, "001"))
                recs.append(rec)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(recs, type=out_type.field("marc").type)],
                names=["record_id", "marc"],
            )

    bench.noop(
        spark.read.text(NDJ).mapInArrow(parse, MARC_SOURCE_SCHEMA)
    )


VARIANTS = {
    "scan_only": v_scan_only,
    "boundary_id": v_boundary_id,
    "full": v_full,
    "full_arrow": v_full_arrow,
}


def main() -> None:
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS)
    n = int(os.environ.get("AB_RUNS", "4"))
    spark = bench.session()
    build_fixture(spark)
    # warmup: python workers + arrow path
    v_full(spark)
    runs = {name: [] for name in only}
    for i in range(n):
        for name in only:
            spark._jvm.System.gc()
            t0 = time.time()
            VARIANTS[name](spark)
            runs[name].append(round(time.time() - t0, 3))
    for name in only:
        rs = runs[name]
        print(f"{name:12s} min {min(rs):6.3f}  med {sorted(rs)[len(rs)//2]:6.3f}  runs {rs}")
    print(json.dumps({"records": RECORDS, "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
