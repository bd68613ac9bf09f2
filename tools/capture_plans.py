#!/usr/bin/env python
"""Capture .explain('formatted') for every noop-sinked bench lane.

Writes plans/<tag>/<lane>_<suffix>.txt for each lane whose bench function
times a `noop(df)` — the capture monkeypatches bench.noop to record the
DataFrame and dump its formatted plan instead of executing it, so the
captured plan is EXACTLY the timed query's plan (same fixture paths, same
operator calls). Lanes that time a non-noop action (JSON sink, Solr POSTs,
streaming run, curate write) have no single output frame to explain; they
are listed in the MANIFEST as skipped.

Usage:
  SPARK_GRAFT_TARGET_RECORDS=2000 python tools/capture_plans.py r15 before
(small target keeps fixture setup cheap; plan SHAPE is scale-independent)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = {s for s in sys.argv[3].split(",") if s} if len(sys.argv) > 3 else None
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = bench.session()
    captured: dict[str, object] = {}
    skipped: list[str] = []

    current = {"name": None}

    def capture_noop(df) -> None:
        captured[current["name"]] = df

    bench.noop = capture_noop

    for name, fn in bench.BENCHES.items():
        if only is not None and name not in only:
            continue
        current["name"] = name
        before = set(captured)
        try:
            fn(spark)
        except Exception as e:  # non-noop lanes execute for real; tolerate
            print(f"capture {name}: error {e}", file=sys.stderr)
        if name not in captured and not (set(captured) - before):
            skipped.append(name)
            continue
        df = captured[name]
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")

    manifest = os.path.join(out_dir, f"MANIFEST_{suffix}.txt")
    with open(manifest, "w", encoding="utf-8") as fh:
        fh.write(
            "captured: " + ", ".join(sorted(captured)) + "\n"
            "skipped (no noop sink — action is a real write/stream/HTTP "
            "path with no single output frame): " + ", ".join(skipped) + "\n"
        )
    print(f"wrote {manifest}")
    spark.stop()


if __name__ == "__main__":
    main()
