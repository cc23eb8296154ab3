#!/bin/bash
# Round-3 final refresh: re-measure the whole matrix with the landed
# wave-thread interleave (SRT_WAVE_THREADS=2 default; +2-3% on any
# config with >=2 waves) and the refined megakernel cadence defaults
# (chunk 3/2 by depth, sort crossover at d30 — the earlier megakernel
# rows were measured at the first-pass chunk=4 defaults).
# Re-launchable; --append replaces only matching rows. Ordered so a
# worker crash late (risky: megakernel minecraft deep rows) cannot
# cost the earlier parts.
set -x
cd /root/repo
echo "=== part d1: wavefront 512^2 full matrix $(date)"
timeout 14400 python benchmark.py --inproc --append --full \
  --renderers wavefront --resolutions 512x512 --runs 2
echo "=== part d2: reference-resolution rows, both engines $(date)"
timeout 18000 python benchmark.py --inproc --append \
  --resolutions 1024x1024 1920x1080 --pairs 10:32 10:128 --runs 2
echo "=== part d3: megakernel 512^2 full matrix $(date)"
timeout 18000 python benchmark.py --inproc --append --full \
  --renderers megakernel --resolutions 512x512 --runs 2
echo "=== part d done $(date)"
touch /tmp/sweep_d_done
