#!/usr/bin/env python
"""Benchmark sweep harness — the reference benchmark.py equivalent.

Runs the CLI binary over a {scene} x {depth} x {samples} x {renderer}
matrix via subprocess, scrapes the stdout contract lines
(`Time measured` / `Total rays` / `Rays/sec`, identical strings to
render_megakernel.cpp:181-183), discards run 0 (XLA compile, the analog
of the reference's SYCL JIT warm-up), and writes benchmark_raw.csv /
benchmark_avg.csv with the same column layout as the reference's CSVs.

Defaults are scaled for practical wall time on one chip; the full
reference matrix (depths 10..50, samples 32..512) is available with
--full.
"""

from __future__ import annotations

import argparse
import csv
import re
import statistics
import subprocess
import sys

RAYS_RE = re.compile(r"Rays/sec: ([0-9.]+)M")
TIME_RE = re.compile(r"Time measured: ([0-9.]+) seconds")
TOTAL_RE = re.compile(r"Total rays: ([0-9]+)")


def run_once(scene, renderer_flag, depth, samples, width, height,
             timeout=3600, seed=0):
    # seed varies per run: the TPU runtime memoizes back-to-back
    # identical executions (CLAUDE.md), which would make repeat runs
    # of an identical config report fantasy times
    cmd = [sys.executable, "-m", "sycl_ray_tracer_tpu", scene,
           renderer_flag, "-d", str(depth), "-s", str(samples),
           "--width", str(width), "--height", str(height),
           "--seed", str(seed)]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=timeout)
    if out.returncode != 0:
        raise RuntimeError(f"run failed: {' '.join(cmd)}\n{out.stderr[-2000:]}")
    text = out.stdout
    return (float(TIME_RE.search(text).group(1)),
            int(TOTAL_RE.search(text).group(1)),
            float(RAYS_RE.search(text).group(1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="*",
                    default=["sponza_proc", "minecraft_proc"])
    ap.add_argument("--depths", nargs="*", type=int, default=[10])
    ap.add_argument("--samples", nargs="*", type=int, default=[4])
    ap.add_argument("--runs", type=int, default=3,
                    help="timed runs per config (plus 1 discarded warm-up)")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--full", action="store_true",
                    help="reference matrix: the exact 9 (depth, spp) "
                         "pairs of /root/reference/benchmark.py "
                         "(36 avg rows over 2 scenes x 2 renderers)")
    ap.add_argument("--renderers", nargs="*",
                    default=["megakernel", "wavefront"])
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-run subprocess timeout (s)")
    args = ap.parse_args()

    if args.full:
        # verbatim reference depth_samples list, including its
        # duplicated (10, 128) row (benchmark.py:6-19)
        pairs = [(10, 128), (20, 128), (30, 128), (40, 128), (50, 128),
                 (10, 32), (10, 128), (10, 256), (10, 512)]
    else:
        pairs = [(d, s) for d in args.depths for s in args.samples]

    raw_rows = []
    avg_rows = []
    # wavefront groups run first: they are ~5x faster, so an
    # interrupted sweep retains the most rows (CSVs rewrite per config)
    for renderer, flag in (("wavefront", "-w"), ("megakernel", "-m")):
        if renderer not in args.renderers:
            continue
        for scene in args.scenes:
            for d, s in pairs:
                per_run = []
                try:
                    for r in range(args.runs + 1):
                        t, total, mrays = run_once(
                            scene, flag, d, s, args.width,
                            args.height, timeout=args.timeout,
                            seed=r)
                        print(f"{scene} {renderer} d={d} s={s} "
                              f"run={r}: {mrays:.2f} Mrays/s"
                              + (" (warm-up, discarded)"
                                 if r == 0 else ""), flush=True)
                        row = [renderer, scene, d, s, r, t, mrays,
                               total]
                        raw_rows.append(row)
                        if r > 0:
                            per_run.append((t, mrays, total))
                except (RuntimeError,
                        subprocess.TimeoutExpired) as e:
                    # keep sweeping; a failed config gets a nan row
                    print(f"{scene} {renderer} d={d} s={s} FAILED: "
                          f"{str(e)[:200]}", flush=True)
                if per_run:
                    avg_rows.append([
                        renderer, scene, d, s,
                        statistics.mean(x[0] for x in per_run),
                        statistics.mean(x[1] for x in per_run),
                        statistics.mean(x[2] for x in per_run),
                    ])
                else:
                    avg_rows.append([renderer, scene, d, s,
                                     "nan", "nan", "nan"])
                # rewrite CSVs after EVERY config: a multi-hour sweep
                # that dies mid-way still leaves its finished rows
                _write_csvs(raw_rows, avg_rows)

    _write_csvs(raw_rows, avg_rows)
    print("wrote benchmark_raw.csv, benchmark_avg.csv")


def _write_csvs(raw_rows, avg_rows):
    with open("benchmark_raw.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["renderer", "scene", "depth", "samples", "run",
                    "time_s", "mrays_per_sec", "total_rays"])
        w.writerows(raw_rows)
    with open("benchmark_avg.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["renderer", "scene", "depth", "samples",
                    "time_s", "mrays_per_sec", "total_rays"])
        w.writerows(avg_rows)


if __name__ == "__main__":
    main()
