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
