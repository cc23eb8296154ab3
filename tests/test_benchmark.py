"""Unit tests for the benchmark harness's row bookkeeping.

The sweep's correctness-critical pure logic: config-keyed CSV row
merging for --append (a re-measured config must replace ALL old rows
with the same (renderer, scene, res, depth, samples) key, including
the reference matrix's duplicated (10, 128) row), and the legacy
7/8-column schema upgrade. The render path itself is covered by
test_cli.py / test_render.py.
"""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
benchmark = importlib.import_module("benchmark")


def test_merge_replaces_all_rows_of_redone_config():
    old = [
        ["wavefront", "sponza_proc", "512x512", "10", "128", 1.0, 4.0, 100],
        ["wavefront", "sponza_proc", "512x512", "10", "128", 1.1, 4.1, 100],
        ["wavefront", "sponza_proc", "512x512", "20", "128", 2.0, 3.0, 200],
    ]
    new = [["wavefront", "sponza_proc", "512x512", 10, 128, 0.9, 5.0, 100]]
    merged = benchmark._merge(old, new)
    # both duplicated old (10,128) rows drop; the (20,128) row survives
    assert merged == [old[2], new[0]]


def test_merge_key_includes_resolution():
    old = [["wavefront", "sponza_proc", "512x512", "10", "128", 1.0, 4.0, 1]]
    new = [["wavefront", "sponza_proc", "1024x1024", 10, 128, 4.0, 4.4, 4]]
    merged = benchmark._merge(old, new)
    assert len(merged) == 2  # different resolution = different config


def test_merge_without_old_rows_is_identity():
    new = [["megakernel", "cube", "64x48", 2, 1, 0.1, 0.5, 10]]
    assert benchmark._merge([], new) == new


def test_read_csvs_upgrades_legacy_schema(tmp_path, monkeypatch):
    # pre-round-3 CSVs had no res column; legacy rows read back as
    # 512x512 (the resolution every checked-in round-2 row used)
    monkeypatch.chdir(tmp_path)
    with open("benchmark_avg.csv", "w") as f:
        f.write("renderer,scene,depth,samples,time_s,mrays,total\n")
        f.write("wavefront,sponza_proc,10,128,30.0,4.2,1000\n")
    raw, avg = benchmark._read_csvs()
    assert raw == []  # missing file tolerated
    assert avg == [["wavefront", "sponza_proc", "512x512", "10", "128",
                    "30.0", "4.2", "1000"]]


def test_merge_nan_row_never_evicts_measured_data():
    old = [["wavefront", "cube", "64x48", "10", "128", "1.1", "4.1", "9"]]
    nan_new = [["wavefront", "cube", "64x48", 10, 128,
                "nan", "nan", "nan"]]
    # transient failure under --append keeps the good old row
    assert benchmark._merge(old, nan_new) == old
    # with no old row for the config, the failure stays loud
    other = [["wavefront", "cube", "64x48", "20", "128", "2", "3", "9"]]
    assert benchmark._merge(other, nan_new) == other + nan_new


def test_append_partial_failure_keeps_csvs_consistent(
        tmp_path, monkeypatch):
    """A config that fails AFTER its warm-up run (run 0 lands, run 1
    raises) must leave the old CSVs untouched AND mutually consistent:
    the stray warm-up raw row must not evict the config's old raw rows
    while its nan avg row (filtered by _merge) keeps the old avg row
    (round-3 review finding)."""
    monkeypatch.chdir(tmp_path)
    old_raw = [
        ["wavefront", "cube", "64x48", "10", "128", "0", "1.0", "4.0",
         "100"],
        ["wavefront", "cube", "64x48", "10", "128", "1", "1.1", "4.1",
         "100"],
    ]
    old_avg = [["wavefront", "cube", "64x48", "10", "128", "1.1",
                "4.1", "100"]]
    benchmark._write_csvs(old_raw, old_avg)

    def fake_run_once(scene, flag, d, s, width, height,
                      timeout=None, seed=0, devices=1):
        if seed == 0:
            return 1.0, 100, 0.1  # warm-up succeeds
        raise RuntimeError("device stall")

    monkeypatch.setattr(benchmark, "run_once", fake_run_once)
    monkeypatch.setattr(sys, "argv", [
        "benchmark.py", "--append", "--scenes", "cube",
        "--renderers", "wavefront", "--pairs", "10:128",
        "--width", "64", "--height", "48", "--runs", "2"])
    benchmark.main()
    raw, avg = benchmark._read_csvs()
    assert raw == old_raw  # no stray warm-up row, old rows intact
    assert avg == old_avg  # nan row filtered, old avg row survives


def test_stall_warning_flags_outlier_run():
    # (time_s, mrays, total) triples; the 4470s run vs 157s siblings
    per_run = [(157.5, 3.69, 581e6), (4469.9, 0.13, 581e6)]
    warn = benchmark._stall_warning(per_run)
    assert warn is not None and "stall" in warn


def test_stall_warning_quiet_on_normal_spread():
    assert benchmark._stall_warning(
        [(157.5, 3.69, 581e6), (157.8, 3.68, 581e6)]) is None
    # single timed run: nothing to compare
    assert benchmark._stall_warning([(157.5, 3.69, 581e6)]) is None
