"""Unit tests for bench.py's artifact math — no Spark session needed.

The bench harness is evidence infrastructure: a bug in the B1 block or
the stall math corrupts the judged artifact silently, so the pure parts
are pinned here (importing bench creates two empty tmpdirs, cleaned at
interpreter exit; it does NOT start Spark)."""

import os

import pytest

import bench


def test_b1_block_raw_and_normalized():
    runs = {"map_full_pipeline": [12.0, 11.0, 30.0]}
    blk = bench._b1_block(runs, {}, observed_cal=2.0)
    assert blk["min_sec_raw"] == 11.0
    assert blk["records"] == bench.TARGET_RECORDS
    # normalization: sec * REF / observed — observed slower than the
    # reference means the normalized time is FASTER than raw
    want = round(11.0 * bench.REFERENCE_CALIBRATION / 2.0, 3)
    assert blk["min_sec_probe_normalized"] == want
    assert blk["records_per_sec_raw"] == round(
        bench.TARGET_RECORDS / 11.0, 1
    )


def test_b1_block_missing_or_failed():
    assert bench._b1_block({}, {}, 1.7) is None
    assert bench._b1_block({"map_full_pipeline": []}, {}, 1.7) is None
    assert (
        bench._b1_block(
            {"map_full_pipeline": [10.0]}, {"map_full_pipeline": "boom"}, 1.7
        )
        is None
    )


def test_b1_block_zero_cal_degrades_to_raw():
    blk = bench._b1_block({"map_full_pipeline": [10.0]}, {}, 0.0)
    assert blk["min_sec_probe_normalized"] == 10.0


def test_stall_flags_two_sided_on_synthetic_slow_pass():
    # probe after pass 1 reads 3x the fastest boundary probe: the pass
    # ENDING at it (1) and the pass STARTING at it (2) are both flagged;
    # passes with clean probes on both sides stay kept (non-vacuous
    # decision — VERDICT r9 item 1)
    flags = bench._stall_flags(1.65, [1.7, 5.0, 1.7, 1.68])
    assert flags == [False, True, True, False]


def test_stall_flags_all_clean_excludes_nothing():
    assert bench._stall_flags(1.65, [1.7, 1.68, 1.72]) == [
        False, False, False,
    ]


def test_stall_flags_relaxes_to_one_sided_when_two_sided_starves():
    # every pass touches a slow probe two-sided (alternating stalls):
    # fewer than 2 passes would survive, so the rule relaxes to
    # end-probe-only vs the SAME baseline
    flags = bench._stall_flags(1.65, [5.0, 1.7, 5.0, 1.7])
    assert flags == [True, False, True, False]


def test_stall_excluded_medians_drop_stalled_samples():
    runs = {"q": [1.0, 9.0, 1.2, 1.1]}
    med, counts = bench._stall_excluded(
        runs, {}, [False, True, False, False]
    )
    assert med["q"] == 1.1 and counts["q"] == 1
    # < 2 surviving samples: falls back to the raw median, but the
    # counts still record what the rule wanted to drop
    med2, counts2 = bench._stall_excluded(
        runs, {}, [True, True, True, False]
    )
    assert med2["q"] == bench._median(runs["q"]) and counts2["q"] == 3


def test_window_status_thresholds():
    limit = bench.WINDOW_DEGRADED_FACTOR * bench.REFERENCE_CALIBRATION
    assert bench._window_status([limit - 0.01]) == "ok"
    assert bench._window_status([limit + 0.01]) == "degraded"
    # only the LAST attempt decides (earlier slow attempts were retried)
    assert bench._window_status([5.0, limit - 0.1]) == "ok"
    assert bench._window_status([]) == "degraded"


def _fake_payload(n_extra=0):
    """A payload shaped like bench.main()'s, over the real query set
    (plus n_extra synthetic long names to stress the budget)."""
    names = list(bench.BENCHES) + [
        f"synthetic_extra_query_with_long_name_{i:02d}" for i in range(n_extra)
    ]
    queries = {n: 3.141 + i * 0.173 for i, n in enumerate(names)}
    mins = {n: v * 0.9 for n, v in queries.items()}
    return {
        "metric": "total_bench_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "window": "ok",
        "queries": {n: round(v, 3) for n, v in queries.items()},
        "min_queries": {n: round(v, 3) for n, v in mins.items()},
        "map_full_pipeline_build_sec": 1.93,
        "calibration": {"start_sec": 1.71, "end_sec": 1.69},
        "b1": {
            "records_per_sec_raw": 70432.1,
            "records_per_sec_probe_normalized": 68011.9,
        },
        "vs_lock": {n: round(1.0 + (i % 7) * 0.05, 2)
                    for i, n in enumerate(names)},
    }


def test_compact_summary_fits_driver_tail_and_parses():
    import json

    line = bench._compact_summary(_fake_payload())
    assert len(line) <= 1900, len(line)
    parsed = json.loads(line)
    # driver contract keys survive
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key
    # qualification + evidence keys the r10 artifact lost to truncation
    assert parsed["window"] == "ok"
    assert parsed["cal"] == [1.71, 1.69]
    assert parsed["build_sec"] == 1.93
    assert parsed["b1_rps_raw"] == 70432.1
    # per-query [min, vs_lock] pairs ride in 'minlock' — r13: a list
    # aligned with the queries key order (the dict form repeated every
    # name and overflowed the 1900-char budget at 30 lanes)
    ml = dict(zip(parsed["queries"], parsed["minlock"]))
    assert set(bench.BENCHES) <= set(ml)
    got_min, got_ratio = ml["map_full_pipeline"]
    assert abs(got_min - 3.141 * 0.9) < 0.01
    assert got_ratio == 1.0
    assert parsed["vsl_med"] is not None


def test_compact_summary_degrades_before_overflowing():
    import json

    # 60 extra long-named queries would blow the budget at full detail:
    # the ladder must still emit a parseable line under budget
    line = bench._compact_summary(_fake_payload(n_extra=60))
    assert len(line) <= 1900, len(line)
    parsed = json.loads(line)
    assert "queries" in parsed and parsed["window"] == "ok"


def test_vs_lock_ratios_only_for_locked_queries():
    locks = {"min_queries": {"a": 2.0, "b": 0.0, "c": 4.0}}
    out = bench._vs_lock({"a": 3.0, "c": 2.0, "rotated_in": 1.0}, locks)
    # 'b' has a degenerate lock, 'rotated_in' has none: no ratio
    assert out == {"a": 1.5, "c": 0.5}
    assert bench._vs_lock({"a": 1.0}, {}) == {}


def test_load_locks_absent_is_empty(tmp_path):
    assert bench._load_locks(str(tmp_path / "nope.json")) == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert bench._load_locks(str(bad)) == {}
    good = tmp_path / "good.json"
    good.write_text('{"min_queries": {"q": 1.5}}')
    assert bench._load_locks(str(good)) == {"min_queries": {"q": 1.5}}


def test_vs_lock_skips_mismatched_record_counts():
    """A soak at 10x the records must get NO drift ratios — 10x data
    legitimately reads ~6-10x the lock, and a meaningless 'drift' in a
    committed artifact is worse than none."""
    locks = {"min_queries": {"a": 2.0}, "target_records": 600_000}
    assert bench._vs_lock({"a": 12.0}, locks, 6_000_000) == {}
    assert bench._vs_lock({"a": 3.0}, locks, 600_000) == {"a": 1.5}
    # legacy locks without the field keep ratioing (backwards compat)
    assert bench._vs_lock({"a": 3.0}, {"min_queries": {"a": 2.0}},
                          600_000) == {"a": 1.5}


def test_ab_run_side_prefers_full_artifact(tmp_path):
    """ADVICE r12: when a side's compact stdout summary sheds minlock
    under the char budget, run_side must pick up BENCH_full_last.json
    (written by the same invocation) so the A/B never records min: None
    silently."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        from ab_bench import run_side
    finally:
        sys.path.pop(0)

    side = tmp_path / "side"
    side.mkdir()
    (side / "bench.py").write_text(
        "import json\n"
        "json.dump({'minlock': {'q1': [1.5, 1.0]}, 'cal': [1.0, 1.0]},"
        " open('BENCH_full_last.json', 'w'))\n"
        "print(json.dumps({'metric': 'x'}))\n"  # compact line: no mins
    )
    art = run_side(str(side), "q1", 1, "/root/testdata/sf0.001")
    assert art["minlock"] == {"q1": [1.5, 1.0]}


def test_window_status_three_state_with_end_calibration():
    """VERDICT r11 #4: BENCH_r11 stamped 'ok' with end cal 2.036 — the
    verdict must grade BOTH boundary calibrations."""
    limit = bench.WINDOW_DEGRADED_FACTOR * bench.REFERENCE_CALIBRATION
    assert bench._window_status([limit - 0.01], limit - 0.01) == "ok"
    assert bench._window_status([limit - 0.01], limit + 0.01) == (
        "ok-degrading"
    )
    # a degraded start stays 'degraded' regardless of the end
    assert bench._window_status([limit + 0.01], limit - 0.5) == "degraded"
    # no end measurement yet: start-only grading (the early stamp)
    assert bench._window_status([limit - 0.01]) == "ok"


def test_vs_lock_noise_floor_clamps_subsecond_locks():
    """VERDICT r11 #3: sub-second locks wander ±13-31% on this box, so
    drift ratios against them measure noise. Locks under the floor
    ratio against the floor; locks above it are untouched."""
    floor = bench.LOCK_NOISE_FLOOR_SEC
    locks = {"min_queries": {"fast": 0.6, "slow": 3.0}}
    got = bench._vs_lock({"fast": 0.77, "slow": 4.5}, locks, None)
    # 0.77/0.6 would read 1.28x; against the floor it reads 0.77x
    assert got["fast"] == round(0.77 / floor, 2)
    assert got["slow"] == 1.5


def test_record_locks_add_only_merges_without_touching_existing(tmp_path):
    """VERDICT r11 #7 lock plumbing: --add-only gives a NEW lane its
    first lock without re-recording (moving) any existing lock."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        import record_locks as rl
    finally:
        sys.path.pop(0)

    locks_path = tmp_path / "LOCKS.json"
    locks_path.write_text(json.dumps(
        {"min_queries": {"old_q": 2.0}, "window": "ok"}
    ))
    orig = rl.LOCKS_PATH
    rl.LOCKS_PATH = str(locks_path)
    try:
        rl.add_only({
            "window": "ok",
            "min_queries": {"old_q": 9.9, "new_lane": 7.39},
            "calibration": {"start_sec": 1.8},
        })
        got = json.loads(locks_path.read_text())
        assert got["min_queries"]["old_q"] == 2.0  # untouched
        assert got["min_queries"]["new_lane"] == 7.39
        assert "new_lane" in got["added_locks"]
        # a degraded window refuses, same as a full record
        import pytest as _pytest
        with _pytest.raises(SystemExit):
            rl.add_only({"window": "ok-degrading",
                         "min_queries": {"x": 1.0}})
    finally:
        rl.LOCKS_PATH = orig


def test_record_locks_add_only_refuses_cross_scale_payload(tmp_path):
    """Review r12: a soak-scale (10x-records) qualified payload must
    not seed a forever-inflated lock for a new lane."""
    import json
    import sys

    import pytest as _pytest

    sys.path.insert(0, "tools")
    try:
        import record_locks as rl
    finally:
        sys.path.pop(0)

    locks_path = tmp_path / "LOCKS.json"
    locks_path.write_text(json.dumps({
        "min_queries": {"old_q": 2.0}, "window": "ok",
        "target_records": 600_000, "sf": 0.1,
    }))
    orig = rl.LOCKS_PATH
    rl.LOCKS_PATH = str(locks_path)
    try:
        with _pytest.raises(SystemExit, match="target_records"):
            rl.add_only({
                "window": "ok", "sf": 0.1,
                "target_records": 6_000_000,
                "min_queries": {"new_lane": 55.0},
            })
        with _pytest.raises(SystemExit, match="sf"):
            rl.add_only({
                "window": "ok", "sf": 1.0,
                "min_queries": {"new_lane": 55.0},
            })
        # matching scale still adds
        rl.add_only({
            "window": "ok", "sf": 0.1, "target_records": 600_000,
            "min_queries": {"new_lane": 5.5},
            "calibration": {"start_sec": 1.8},
        })
        assert json.loads(locks_path.read_text())["min_queries"][
            "new_lane"
        ] == 5.5
    finally:
        rl.LOCKS_PATH = orig


def test_batched_rows_bounds_by_count_and_bytes():
    """The shared flush policy behind all four mapInPandas fan-outs
    (review r12): bounded by rows, by bytes when rows carry payloads,
    and yields nothing for empty input."""
    from traject_spark.arrowutil import batched_rows

    batches = list(batched_rows(iter(range(25_000)), list, chunk_rows=10_000))
    assert [len(b) for b in batches] == [10_000, 10_000, 5_000]
    assert batches[0][0] == 0 and batches[2][-1] == 24_999  # order kept

    # byte-aware: 2 MB payloads flush at the byte bound, not 10k rows
    rows = [b"x" * (2 << 20)] * 100
    sized = list(batched_rows(
        iter(rows), list, row_bytes=len, chunk_bytes=64 << 20
    ))
    assert all(len(b) <= 32 for b in sized)
    assert sum(len(b) for b in sized) == 100

    assert list(batched_rows(iter([]), list)) == []


def test_record_locks_full_record_refuses_scaleless_payload(tmp_path):
    """Review r12: record() must not write target_records: null (which
    would disarm add_only's cross-scale guard forever after)."""
    import sys

    import pytest as _pytest

    sys.path.insert(0, "tools")
    try:
        import record_locks as rl
    finally:
        sys.path.pop(0)

    with _pytest.raises(SystemExit, match="record-count scale"):
        rl.record({"window": "ok", "min_queries": {"q": 1.0}})


def test_committed_official_artifact_window_ok():
    """VERDICT r12 #2: the COMMITTED official bench artifact must have
    qualified — commit 034bb79 shipped a window='degraded' artifact
    under an 'ok-degrading' commit message, and stamps-vs-narrative
    drift is exactly what the evidence chain exists to prevent. Reads
    the HEAD version (not the working tree, which any local bench run
    overwrites); refresh via tools/refresh_bench_artifact.py, which
    refuses to install a non-ok run."""
    import json
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["git", "show", "HEAD:BENCH_full_last.json"],
        cwd=repo, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        pytest.skip("no committed BENCH_full_last.json at HEAD")
    payload = json.loads(proc.stdout)
    assert payload.get("window") == "ok", (
        payload.get("window"), payload.get("window_margin"),
        "refresh with tools/refresh_bench_artifact.py on a quiet box",
    )
    # the OFFICIAL artifact is the sf0.1 run (BASELINE.md scale) — a
    # dev-scale run committed by a broad `git add` must not squat the
    # official slot (that is how r13 nearly re-created the r12 drift)
    assert payload.get("sf") == 0.1, payload.get("sf")


def test_committed_notes_stamp_matches_committed_artifact():
    """VERDICT r13 #6: the newest committed R*_NOTES.md must not quote a
    superseded artifact. tools/refresh_bench_artifact.py maintains a
    canonical stamp block in the notes; this test re-derives the stamp
    from the COMMITTED artifact and asserts the committed notes' block
    quotes exactly it. Notes predating the mechanism (no marker) skip —
    but once a stamp exists it must match."""
    import json
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def show(path):
        proc = subprocess.run(
            ["git", "show", f"HEAD:{path}"],
            cwd=repo, capture_output=True, text=True,
        )
        return proc.stdout if proc.returncode == 0 else None

    art = show("BENCH_full_last.json")
    if art is None:
        pytest.skip("no committed BENCH_full_last.json at HEAD")
    ls = subprocess.run(
        ["git", "ls-tree", "--name-only", "HEAD"],
        cwd=repo, capture_output=True, text=True,
    ).stdout.splitlines()
    notes_files = sorted(
        (f for f in ls if re.fullmatch(r"R(\d+)_NOTES\.md", f)),
        key=lambda f: int(re.match(r"R(\d+)", f).group(1)),
    )
    if not notes_files:
        pytest.skip("no committed round notes at HEAD")
    notes = show(notes_files[-1])
    sys_path = os.path.join(repo, "tools")
    import sys as _sys

    _sys.path.insert(0, sys_path)
    try:
        from refresh_bench_artifact import NOTES_MARKER, stamp_line
    finally:
        _sys.path.remove(sys_path)
    if NOTES_MARKER not in notes:
        pytest.skip(
            f"{notes_files[-1]} predates the notes-stamp mechanism"
        )
    expected = stamp_line(json.loads(art))
    assert expected in notes.split(NOTES_MARKER, 1)[1], (
        f"{notes_files[-1]} stamp block does not quote the committed "
        f"artifact; expected line: {expected!r} — re-run "
        "tools/refresh_bench_artifact.py and recommit"
    )


def test_bench_artifact_routing_by_run_kind():
    """r15: only a qualified FULL run may write the official slot —
    partial lane selections and degraded windows route to their own
    files, so an end-of-round 'commit the working tree' can never
    replace the official artifact with a non-official run (the drift
    class that recurred in the r13 AND r14 wrap commits)."""
    import bench

    assert bench._artifact_name(False, "ok") == "BENCH_full_last.json"
    assert bench._artifact_name(True, "ok") == "BENCH_partial_last.json"
    assert bench._artifact_name(True, "degraded") == "BENCH_partial_last.json"
    assert (
        bench._artifact_name(False, "degraded")
        == "BENCH_full_last.degraded.json"
    )
    assert (
        bench._artifact_name(False, "ok-degrading")
        == "BENCH_full_last.degraded.json"
    )
