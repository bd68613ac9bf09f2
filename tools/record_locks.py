"""Record LOCKS.json: the qualified-window per-query performance locks.

The locks are the baseline `bench.py`'s `vs_lock` ratios compare
against. Policy (docs/extending.md "Performance-lock policy"): locks
re-record ONLY by an explicit decision via this tool — never silently —
and only from a run whose window self-qualified `ok`, because a lock
caught on an unqualified fast window permanently poisons the drift
ratio of innocent queries (VERDICT r10 "What's wrong" #3: embed_topk
read 1.33-1.8x of its r1 lock for three rounds while A/B runs
repeatedly exonerated the code).

Usage:
    python tools/record_locks.py            # run bench, record if ok
    python tools/record_locks.py --from-payload BENCH_full_last.json
                                            # adopt an existing run

Refuses to write when the source run's window is not "ok".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCKS_PATH = os.path.join(REPO, "LOCKS.json")
FULL_PAYLOAD = os.path.join(REPO, "BENCH_full_last.json")


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def add_only(payload: dict) -> None:
    """Merge ONLY queries absent from LOCKS.json (a rotated-in or new
    bench lane getting its first lock). Existing locks are untouched —
    a full re-record stays its own explicit decision — and the addition
    stamps its own provenance (commit + window cal) per query."""
    window = payload.get("window")
    if window != "ok":
        raise SystemExit(
            f"refusing to add locks from a window={window!r} run"
        )
    mins = payload.get("min_queries") or {}
    with open(LOCKS_PATH, "r", encoding="utf-8") as fh:
        locks = json.load(fh)
    # scale guard (review r12): a soak-scale payload (10x records)
    # passed here would seed a forever-inflated lock that masks real
    # regressions — refuse when the payload's scale disagrees with the
    # file's. The MEASURED b1.records is authoritative when present
    # (a stale/hand-edited nominal stamp must not override it);
    # BENCH_ONLY payloads have no b1, so fall back to the stamp.
    pay_records = (payload.get("b1") or {}).get(
        "records"
    ) or payload.get("target_records")
    lock_records = locks.get("target_records")
    if (
        pay_records is not None
        and lock_records is not None
        and pay_records != lock_records
    ):
        raise SystemExit(
            f"refusing: payload records {pay_records} != locks "
            f"target_records {lock_records} (soak-scale lock)"
        )
    if payload.get("sf") != locks.get("sf"):
        raise SystemExit(
            f"refusing: payload sf {payload.get('sf')!r} != locks sf "
            f"{locks.get('sf')!r}"
        )
    existing = locks.setdefault("min_queries", {})
    added = {
        n: round(v, 3) for n, v in mins.items()
        if n not in existing and v is not None
    }
    if not added:
        raise SystemExit("no new queries to add (all already locked)")
    existing.update(added)
    locks["min_queries"] = dict(sorted(existing.items()))
    prov = locks.setdefault("added_locks", {})
    for n in added:
        prov[n] = {
            "commit": _git_head(),
            "start_cal_sec": (
                payload.get("calibration") or {}
            ).get("start_sec"),
        }
    with open(LOCKS_PATH, "w", encoding="utf-8") as fh:
        json.dump(locks, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"added locks for {sorted(added)} -> {LOCKS_PATH}")


def update_named(payload: dict, names: list) -> None:
    """Re-record ONLY the named queries (a lane whose DEFINITION
    changed — e.g. ingest_marcxml moving to .xml.gz fixtures in r13 —
    must not keep a lock measured on the old workload). Same window/
    scale guards as add_only; provenance stamped per query."""
    window = payload.get("window")
    if window != "ok":
        raise SystemExit(
            f"refusing to update locks from a window={window!r} run"
        )
    mins = payload.get("min_queries") or {}
    with open(LOCKS_PATH, "r", encoding="utf-8") as fh:
        locks = json.load(fh)
    pay_records = (payload.get("b1") or {}).get(
        "records"
    ) or payload.get("target_records")
    if pay_records != locks.get("target_records"):
        raise SystemExit(
            f"refusing: payload records {pay_records} != locks "
            f"target_records {locks.get('target_records')}"
        )
    if payload.get("sf") != locks.get("sf"):
        raise SystemExit(
            f"refusing: payload sf {payload.get('sf')!r} != locks sf "
            f"{locks.get('sf')!r}"
        )
    existing = locks.setdefault("min_queries", {})
    prov = locks.setdefault("added_locks", {})
    for n in names:
        if n not in existing:
            raise SystemExit(f"{n} has no lock — use --add-only")
        if n not in mins or mins[n] is None:
            raise SystemExit(f"payload has no min for {n}")
        old_v = existing[n]
        existing[n] = round(mins[n], 3)
        prov[n] = {
            "commit": _git_head(),
            "start_cal_sec": (
                payload.get("calibration") or {}
            ).get("start_sec"),
            "replaced": old_v,
            "reason": "lane definition changed",
        }
        print(f"updated lock {n}: {old_v} -> {existing[n]}")
    with open(LOCKS_PATH, "w", encoding="utf-8") as fh:
        json.dump(locks, fh, indent=1, sort_keys=False)
        fh.write("\n")


def record(payload: dict) -> None:
    window = payload.get("window")
    if window != "ok":
        raise SystemExit(
            f"refusing to record locks from a window={window!r} run: "
            "locks must come from a qualified window (policy in "
            "docs/extending.md)"
        )
    mins = payload.get("min_queries") or {}
    if not mins:
        raise SystemExit("payload has no min_queries — nothing to lock")
    if not (
        (payload.get("b1") or {}).get("records")
        or payload.get("target_records")
    ):
        raise SystemExit(
            "payload carries no record-count scale (neither b1.records "
            "nor target_records) — a full re-record from it would write "
            "target_records: null and disarm the cross-scale guard; "
            "record from a full bench payload"
        )
    locks = {
        "policy": (
            "qualified-window (window=ok) min-of-N per query; re-record "
            "ONLY via tools/record_locks.py by explicit decision — see "
            "docs/extending.md 'Performance-lock policy'"
        ),
        "recorded_at_commit": _git_head(),
        "window": window,
        "start_cal_sec": (payload.get("calibration") or {}).get("start_sec"),
        "sf": payload.get("sf"),
        # ratio scope: a soak at a different record count gets no
        # vs_lock ratios (bench._vs_lock checks this). Measured
        # b1.records first, payload stamp as fallback — and a full
        # re-record REFUSES a payload with neither: writing null here
        # would disarm add_only's cross-scale guard forever after
        # (review r12).
        "target_records": (payload.get("b1") or {}).get("records")
        or payload.get("target_records"),
        "n_runs_hint": max(
            (len(v) for v in (payload.get("runs") or {}).values()),
            default=None,
        ),
        "min_queries": {n: round(v, 3) for n, v in sorted(mins.items())},
    }
    with open(LOCKS_PATH, "w", encoding="utf-8") as fh:
        json.dump(locks, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(
        f"recorded {len(mins)} locks at {locks['recorded_at_commit']} "
        f"(cal {locks['start_cal_sec']}s) -> {LOCKS_PATH}"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--from-payload",
        help="adopt an existing full bench payload instead of running "
        "bench.py (e.g. BENCH_full_last.json)",
    )
    ap.add_argument(
        "--add-only",
        action="store_true",
        help="merge only queries not yet in LOCKS.json (first lock for "
        "a new/rotated-in lane); existing locks untouched",
    )
    ap.add_argument(
        "--update",
        help="comma-separated query names whose LANE DEFINITION changed: "
        "re-record only those locks from the payload (explicit decision, "
        "provenance stamped)",
    )
    args = ap.parse_args()
    if args.from_payload:
        with open(args.from_payload, "r", encoding="utf-8") as fh:
            payload = json.load(fh)
        if args.update:
            update_named(payload, [s for s in args.update.split(",") if s])
        elif args.add_only:
            add_only(payload)
        else:
            record(payload)
        return
    rc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                        cwd=REPO).returncode
    if rc != 0:
        raise SystemExit(f"bench.py exited {rc}; locks not recorded")
    with open(FULL_PAYLOAD, "r", encoding="utf-8") as fh:
        record(json.load(fh))


if __name__ == "__main__":
    main()
