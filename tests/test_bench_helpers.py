"""Unit tests for bench.py's artifact math — no Spark session needed.

The bench harness is evidence infrastructure: a bug in the B1 block or
the stall math corrupts the judged artifact silently, so the pure parts
are pinned here (importing bench creates two empty tmpdirs, cleaned at
interpreter exit; it does NOT start Spark)."""

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
