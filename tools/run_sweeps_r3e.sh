#!/bin/bash
# Round-3 mop-up: re-measure the one avg row part d2 left polluted.
# megakernel sponza_proc 1024^2 d10 s128 run=2 hit a ~4470 s device
# stall (worker hiccup, 30x the sibling runs' 157 s) and dragged the
# --append average to 1.91; runs 0-1 of the same invocation measured
# 3.68-3.69. Re-run the config; --append replaces the matching rows.
set -x
cd /root/repo
echo "=== part e1: re-measure the stalled megakernel row $(date)"
timeout 3600 python benchmark.py --inproc --append \
  --renderers megakernel --scenes sponza_proc \
  --resolutions 1024x1024 --pairs 10:128 --runs 2
echo "=== part e done $(date)"
touch /tmp/sweep_e_done
