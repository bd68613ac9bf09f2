"""Merge per-phase bench payloads (one lane group per process) into one
soak artifact.

tools/soak_sf10.sh runs each fixture-heavy lane group in its own
bench.py process so tmp corpora are reclaimed between phases (the
combined 60M-record fixtures exceed the box's tmp headroom). This
merges the phases' queries/runs/mins and keeps every phase's window
stamp + calibrations — a soak is only as qualified as its WORST phase,
so the merged `window` is 'ok' iff every phase stamped 'ok', and the
merged `window_margin` is the minimum."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("phases", nargs="+")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    merged = None
    windows, margins, phase_cals = [], [], []
    for path in args.phases:
        with open(path, "r", encoding="utf-8") as fh:
            p = json.load(fh)
        windows.append(p.get("window"))
        if p.get("window_margin") is not None:
            margins.append(p["window_margin"])
        phase_cals.append(p.get("calibration"))
        if merged is None:
            merged = p
            continue
        for key in ("queries", "runs", "min_queries",
                    "medians_stall_excluded", "stall_excluded_counts",
                    "vs_lock"):
            merged.setdefault(key, {}).update(p.get(key) or {})
        if p.get("b1"):
            merged["b1"] = p["b1"]
        merged["stalled_passes"] = (
            merged.get("stalled_passes") or []
        ) + (p.get("stalled_passes") or [])
        if p.get("map_full_pipeline_build_sec"):
            merged["map_full_pipeline_build_sec"] = p[
                "map_full_pipeline_build_sec"
            ]
    assert merged is not None
    merged["value"] = round(
        sum(v for v in merged["queries"].values() if v >= 0), 3
    )
    merged["window"] = (
        "ok" if all(w == "ok" for w in windows)
        else "ok-degrading" if all(w in ("ok", "ok-degrading")
                                   for w in windows)
        else "degraded"
    )
    merged["window_margin"] = min(margins) if margins else None
    merged["phase_windows"] = windows
    merged["phase_calibrations"] = phase_cals
    merged["merged_from_phases"] = len(args.phases)
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    print(
        f"merged {len(args.phases)} phases -> {args.out} "
        f"(window={merged['window']}, margin={merged['window_margin']})"
    )


if __name__ == "__main__":
    main()
