#!/usr/bin/env python
"""Tune the bounce-chunked megakernel's two cadence knobs (PLAN_TPU
roadmap #3): SRT_MK_CHUNK (bounce iterations fused per device program)
and SRT_MK_SORT (in-program coherence re-sort every k bounces).

Both defaults (chunk=6, sort=1) were each chosen from a single
measurement in round 3; this sweeps the small grid around them on the
headline megakernel configs (sponza_proc 512^2 d10/d50 s128 — shallow
and deep, where the chunk/depth interaction differs most). Runs
in-process (CLAUDE.md: the axon backend recompiles everything per
process), fresh seeds per run, np.asarray fence, run 0 discarded.

Usage: python tools/tune_mk_cadence.py [--quick]
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 timed run per config instead of 2")
    ap.add_argument("--chunks", nargs="*", type=int,
                    default=[3, 4, 6, 8, 12])
    ap.add_argument("--sorts", nargs="*", type=int, default=[1, 2, 3])
    ap.add_argument("--depths", nargs="*", type=int, default=[10, 50])
    args = ap.parse_args()

    import jax
    if os.environ.get("SRT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SRT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from benchmark import run_once_inproc

    ctx = {}
    runs = 1 if args.quick else 2
    best = {}
    for depth in args.depths:
        for chunk, sort in itertools.product(args.chunks, args.sorts):
            os.environ["SRT_MK_CHUNK"] = str(chunk)
            os.environ["SRT_MK_SORT"] = str(sort)
            rates = []
            for r in range(runs + 1):
                secs, total, mrs = run_once_inproc(
                    ctx, "sponza_proc", "megakernel", depth, 128,
                    512, 512, seed=1000 * depth + 10 * chunk + r)
                if r > 0:
                    rates.append(mrs)
                tag = "(warm-up, discarded)" if r == 0 else ""
                print(f"d={depth} chunk={chunk} sort={sort} run={r}: "
                      f"{mrs:.2f} Mrays/s {tag}", flush=True)
            avg = sum(rates) / len(rates)
            key = depth
            if key not in best or avg > best[key][0]:
                best[key] = (avg, chunk, sort)
    for depth, (avg, chunk, sort) in sorted(best.items()):
        print(f"BEST d={depth}: chunk={chunk} sort={sort} "
              f"{avg:.2f} Mrays/s")


if __name__ == "__main__":
    main()
