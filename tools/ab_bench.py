"""Alternating A/B bench attribution between two checkouts.

The only A/B methodology that survives this box's heavy-tailed host
stalls (see BENCH notes): run side A and side B ALTERNATELY in one
wall-clock window (A B A B ...), each side in its own subprocess using
its checkout's own bench.py, and compare per-query MIN over its runs.
A slow-drift window then pollutes both sides roughly equally, and the
per-run JVM calibration stamps let a reader drop stalled invocations.

Usage:
    python tools/ab_bench.py /tmp/ab_r7 /tmp/ab_r8 \
        --queries text_stats,map_translation,ann_ivf_topk,embed_near_dup_lsh \
        --rounds 3 --runs 2 --out AB_r7_vs_r8.json

Each invocation of a side runs
    SPARK_GRAFT_BENCH_ONLY=<queries> SPARK_GRAFT_BENCH_RUNS=<runs>
    python <side>/bench.py
and parses the one-line JSON artifact. Output: per-query lists of
per-invocation minima for both sides, the min-of-mins ratio B/A, and
every invocation's calibration stamps for stall auditing.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_side(side_dir: str, queries: str, runs: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["PYTHONPATH"] = side_dir
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(side_dir, "bench.py")],
        cwd=side_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = round(time.time() - t0, 1)
    last = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if proc.returncode != 0 or not last:
        raise RuntimeError(
            f"{side_dir} bench failed rc={proc.returncode}: "
            f"{proc.stderr[-2000:]}"
        )
    art = json.loads(last[-1])
    # r11+ sides write the FULL payload to BENCH_full_last.json and may
    # shed keys (minlock, runs) from the 1900-char stdout summary —
    # prefer the full artifact when this invocation just wrote it
    full = os.path.join(side_dir, "BENCH_full_last.json")
    try:
        if os.path.getmtime(full) >= t0:
            with open(full) as fh:
                art = json.load(fh)
    except (OSError, ValueError):
        pass
    art["_wall_sec"] = wall
    return art


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("side_a")
    ap.add_argument("side_b")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    names = args.queries.split(",")
    sides = {"A": args.side_a, "B": args.side_b}
    invocations: list[dict] = []
    for rnd in range(args.rounds):
        for label in ("A", "B"):
            print(
                f"AB round {rnd + 1}/{args.rounds} side {label} "
                f"({sides[label]}) ...",
                file=sys.stderr,
                flush=True,
            )
            art = run_side(sides[label], args.queries, args.runs, args.sf_dir)
            cal = art.get("calibration", {})
            # r11+ bench prints a compact summary LAST: mins live in
            # 'minlock' ([min, vs_lock] pairs) and calibrations in
            # 'cal'; older sides keep the verbose-line fields
            ml = art.get("minlock")
            if isinstance(ml, list):
                # r13 compact shape: list aligned with queries key order
                ml = dict(zip(art.get("queries", {}), ml))
            mins_art = art.get("min_queries") or {
                n: mv[0] for n, mv in (ml or {}).items()
            }
            if not mins_art:
                # neither key present (a summary that shed minlock under
                # its char budget AND no full artifact): recording
                # min: None for every query would silently void the A/B
                raise RuntimeError(
                    f"side {label} ({sides[label]}) artifact has neither "
                    "min_queries nor minlock — cannot attribute; check "
                    "BENCH_full_last.json in that checkout"
                )
            cal_pair = art.get("cal") or [
                cal.get("start_sec"), cal.get("end_sec")
            ]
            inv = {
                "round": rnd,
                "side": label,
                "wall_sec": art["_wall_sec"],
                "cal_start": cal_pair[0],
                "cal_end": cal_pair[1],
                "pass_probes": cal.get("pass_probes"),
                "runs": {n: art.get("runs", {}).get(n) for n in names},
                "min": {n: mins_art.get(n) for n in names},
            }
            invocations.append(inv)
            print(
                f"  -> min {inv['min']} cal {inv['cal_start']}/"
                f"{inv['cal_end']}",
                file=sys.stderr,
                flush=True,
            )

    summary = {}
    for n in names:
        mins = {
            s: [
                i["min"][n]
                for i in invocations
                if i["side"] == s and i["min"].get(n) is not None
            ]
            for s in ("A", "B")
        }
        if mins["A"] and mins["B"]:
            a, b = min(mins["A"]), min(mins["B"])
            summary[n] = {
                "A_mins": mins["A"],
                "B_mins": mins["B"],
                "A_best": a,
                "B_best": b,
                "ratio_B_over_A": round(b / a, 3),
            }
    out = {
        "side_a": sides["A"],
        "side_b": sides["B"],
        "sf_dir": args.sf_dir,
        "rounds": args.rounds,
        "runs_per_invocation": args.runs,
        "summary": summary,
        "invocations": invocations,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
