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
