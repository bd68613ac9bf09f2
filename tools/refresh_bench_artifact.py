"""Refresh the OFFICIAL committed bench artifact (BENCH_full_last.json).

VERDICT r12 "what's wrong" #1: the r12 committed artifact stamped
``window: "degraded"`` while its commit message said "ok-degrading" —
the evidence chain must not let narrative drift from the stamp. This
tool is the one sanctioned way to refresh the artifact:

- runs bench.py (or adopts --from-payload),
- REFUSES to leave a non-"ok" artifact as the official one (the
  degraded run stays on disk as BENCH_full_last.degraded.json for
  forensics, and the previous official artifact is restored),
- on success prints the exact stamp line to paste into the commit
  message, so message text is derived from the stamp, never typed.

tests/test_bench_helpers.py::test_committed_official_artifact_window_ok
asserts the COMMITTED artifact qualifies, so a hand-committed degraded
artifact fails the suite.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OFFICIAL = os.path.join(REPO, "BENCH_full_last.json")


def stamp_line(payload: dict) -> str:
    cal = payload.get("calibration") or {}
    return (
        f"bench artifact: window={payload.get('window')} "
        f"margin={payload.get('window_margin')} "
        f"cal=[{cal.get('start_sec')}, {cal.get('end_sec')}] "
        f"total={payload.get('value')}s sf={payload.get('sf')}"
    )


NOTES_MARKER = "## Official artifact stamp"


def sync_notes_stamp(payload: dict) -> str | None:
    """Write the canonical stamp block into the newest R*_NOTES.md.

    VERDICT r13 "what's wrong" #2: round notes quoting a SUPERSEDED
    artifact's numbers recreate the narrative-drift class the stamp
    test exists to prevent. So the refresh tool itself maintains the
    one quotable perf section — the stamp block is always the FINAL
    section of the notes (anything after a previous marker is replaced),
    and tests/test_bench_helpers.py asserts the committed notes' stamp
    matches the committed artifact. Returns the notes path updated, or
    None when no R*_NOTES.md exists yet."""
    import glob
    import re

    notes = sorted(
        glob.glob(os.path.join(REPO, "R*_NOTES.md")),
        key=lambda p: int(re.search(r"R(\d+)_NOTES", p).group(1)),
    )
    if not notes:
        return None
    path = notes[-1]
    with open(path, "r", encoding="utf-8") as fh:
        text = fh.read()
    block = (
        f"{NOTES_MARKER}\n\n"
        "<!-- maintained by tools/refresh_bench_artifact.py; quote THESE\n"
        "numbers in perf narrative — they are re-stamped on every\n"
        "official refresh, so they can never describe a superseded\n"
        "artifact -->\n"
        f"{stamp_line(payload)}\n"
    )
    if NOTES_MARKER in text:
        text = text.split(NOTES_MARKER)[0].rstrip() + "\n\n" + block
    else:
        text = text.rstrip() + "\n\n" + block
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    return path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--from-payload",
        help="adopt an existing full payload instead of running bench.py",
    )
    args = ap.parse_args()
    if args.from_payload:
        with open(args.from_payload, "r", encoding="utf-8") as fh:
            payload = json.load(fh)
        if payload.get("window") != "ok":
            raise SystemExit(
                f"refusing: payload window={payload.get('window')!r} "
                f"(margin {payload.get('window_margin')}) — the official "
                "artifact must qualify; re-run on a quieter box"
            )
        if os.path.abspath(args.from_payload) != OFFICIAL:
            shutil.copyfile(args.from_payload, OFFICIAL)
        print(stamp_line(payload))
        notes = sync_notes_stamp(payload)
        if notes:
            print(f"notes stamp synced -> {notes}")
        print(f"official artifact refreshed -> {OFFICIAL}")
        return
    # r15: bench.py itself now routes degraded full runs to
    # BENCH_full_last.degraded.json and never touches the official slot
    # for them — so this tool just detects which file the run wrote.
    before = os.path.getmtime(OFFICIAL) if os.path.exists(OFFICIAL) else None
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO
    ).returncode
    if rc != 0:
        raise SystemExit(f"bench.py exited {rc}; artifact not refreshed")
    after = os.path.getmtime(OFFICIAL) if os.path.exists(OFFICIAL) else None
    if after is None or after == before:
        degraded = OFFICIAL.replace(".json", ".degraded.json")
        msg = "bench.py wrote no artifact"
        if os.path.exists(degraded):
            with open(degraded, "r", encoding="utf-8") as fh:
                d = json.load(fh)
            msg = (
                f"window={d.get('window')!r} (margin "
                f"{d.get('window_margin')}): degraded run kept as "
                "BENCH_full_last.degraded.json, official slot untouched"
            )
        raise SystemExit(f"{msg} — re-run on a quieter box")
    with open(OFFICIAL, "r", encoding="utf-8") as fh:
        payload = json.load(fh)
    print(stamp_line(payload))
    notes = sync_notes_stamp(payload)
    if notes:
        print(f"notes stamp synced -> {notes}")
    print(f"official artifact refreshed -> {OFFICIAL}")


if __name__ == "__main__":
    main()
