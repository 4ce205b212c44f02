"""bench.py wedged-tunnel fallback: the official round artifact cites the
newest healthy self-preserved capture when the device is unreachable
(VERDICT r2 weak #2). Pin the selection rules: newest by mtime (NOT
lexicographic — `_partial` sorts after the plain name and r10 before r9),
"parsed"-wrapped captures are unwrapped, and unreadable/no-capture cases
degrade to None instead of raising (the failure record must still print).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write(path, obj, mtime):
    with open(path, "w") as f:
        json.dump(obj, f)
    os.utime(path, (mtime, mtime))


def test_picks_mtime_newest_and_unwraps_parsed(tmp_path):
    t0 = time.time() - 1000
    # older round-2 capture, bare record layout
    _write(tmp_path / "BENCH_MIDROUND_r02.json",
           {"value": 310.4, "extra": {"k": 1}}, t0)
    # lexicographically-last partial, but OLDER than the preserved capture
    _write(tmp_path / "BENCH_MIDROUND_r03_partial.json",
           {"value": 280.0, "note": "partial", "extra": {}}, t0 + 10)
    # newest: preserved capture wrapping the record under "parsed"
    _write(tmp_path / "BENCH_MIDROUND_r03.json",
           {"note": "preserved", "parsed": {"value": 310.83,
                                            "extra": {"k": 2}}}, t0 + 20)
    got = bench._newest_healthy_capture(str(tmp_path))
    assert got == {"file": "BENCH_MIDROUND_r03.json", "value": 310.83,
                   "extra": {"k": 2}}


def test_partial_wins_when_it_is_newest(tmp_path):
    t0 = time.time() - 1000
    _write(tmp_path / "BENCH_MIDROUND_r03.json",
           {"parsed": {"value": 1.0, "extra": {}}}, t0)
    _write(tmp_path / "BENCH_MIDROUND_r03_partial.json",
           {"value": 2.0, "extra": {"a": 1}}, t0 + 5)
    got = bench._newest_healthy_capture(str(tmp_path))
    assert got["file"] == "BENCH_MIDROUND_r03_partial.json"
    assert got["value"] == 2.0


def test_degrades_to_none(tmp_path):
    assert bench._newest_healthy_capture(str(tmp_path)) is None
    bad = tmp_path / "BENCH_MIDROUND_r99.json"
    bad.write_text("{not json")
    assert bench._newest_healthy_capture(str(tmp_path)) is None


def test_corrupt_newest_falls_back_to_older_readable(tmp_path):
    t0 = time.time() - 1000
    _write(tmp_path / "BENCH_MIDROUND_r03.json",
           {"parsed": {"value": 310.83, "extra": {"k": 2}}}, t0)
    bad = tmp_path / "BENCH_MIDROUND_r04_partial.json"
    bad.write_text("{torn write")
    os.utime(bad, (t0 + 20, t0 + 20))
    got = bench._newest_healthy_capture(str(tmp_path))
    assert got == {"file": "BENCH_MIDROUND_r03.json", "value": 310.83,
                   "extra": {"k": 2}}
