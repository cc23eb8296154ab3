#!/bin/bash
# Round-3 follow-up: the part-b configs the TPU backend crash aborted
# (INTERNAL mid wavefront-sponza-1080p-s128; finished rows were saved).
# Re-launchable; --append replaces only matching rows.
set -x
cd /root/repo
echo "=== part c1: wavefront sponza 1080p s128 (the crashed config) $(date)"
timeout 3600 python benchmark.py --inproc --append \
  --renderers wavefront --scenes sponza_proc \
  --resolutions 1920x1080 --pairs 10:128 --runs 2
echo "=== part c2: wavefront minecraft reference-resolution rows $(date)"
timeout 10800 python benchmark.py --inproc --append \
  --renderers wavefront --scenes minecraft_proc \
  --resolutions 1024x1024 1920x1080 --pairs 10:32 10:128 --runs 2
echo "=== part c3: megakernel reference-resolution rows $(date)"
timeout 14400 python benchmark.py --inproc --append \
  --renderers megakernel \
  --scenes sponza_proc minecraft_proc \
  --resolutions 1024x1024 1920x1080 --pairs 10:32 10:128 --runs 2
echo "=== part c done $(date)"
touch /tmp/sweep_c_done
