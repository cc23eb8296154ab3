#!/usr/bin/env python
"""Regenerate the README benchmark-matrix tables from benchmark_avg.csv.

Prints the two markdown tables (512x512 matrix, reference-resolution
rows) in README row order; paste over the stale ones after a sweep.
"""
import csv
from collections import OrderedDict

rows = list(csv.DictReader(open("benchmark_avg.csv")))
by = {(r["renderer"], r["scene"], r["res"], int(r["depth"]),
       int(r["samples"])): float(r["mrays_per_sec"]) for r in rows}

PAIRS = [(10, 128), (20, 128), (30, 128), (40, 128), (50, 128),
         (10, 32), (10, 128), (10, 256), (10, 512)]

print("| renderer | scene | depth | spp | Mrays/s |")
print("|---|---|---|---|---|")
for ren in ("wavefront", "megakernel"):
    for scene in ("sponza_proc", "minecraft_proc"):
        for d, s in PAIRS:
            v = by.get((ren, scene, "512x512", d, s))
            print(f"| {ren} | {scene} | {d} | {s} | "
                  f"{v:.2f} |" if v is not None else
                  f"| {ren} | {scene} | {d} | {s} | — |")

print()
print("| renderer | scene | resolution | spp | Mrays/s |")
print("|---|---|---|---|---|")
for ren in ("wavefront", "megakernel"):
    for scene in ("sponza_proc", "minecraft_proc"):
        for res in ("1024x1024", "1920x1080"):
            for s in (32, 128):
                v = by.get((ren, scene, res, 10, s))
                if v is not None:
                    print(f"| {ren} | {scene} | {res} | {s} | {v:.2f} |")
