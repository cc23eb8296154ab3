#!/bin/bash
# Round-4: re-measure the wavefront rows whose frames exceed the ~68M
# whole-frame threshold after the fallback wave size moved 32M -> 48M
# (tools/probe_wave_size.py at 1920x1080 s128: 32M 5.08 / 48M 5.13 /
# 64M RESOURCE_EXHAUSTED — PLAN_TPU round-4 facts). Affected rows:
# s128 at 1024^2 and 1920x1080 (134M / 265M-ray frames) and s512 at
# 512^2 (134M); every other row's frame fits one whole-frame wave.
# Megakernel rows are untouched (lane-bounce-capped, separate knob).
# Re-launchable; --append replaces only matching rows.
set -x
cd /root/repo
echo "=== part a: wavefront reference-resolution s128 rows $(date)"
timeout 7200 python benchmark.py --inproc --append \
  --renderers wavefront --resolutions 1024x1024 1920x1080 \
  --pairs 10:128 --runs 2
touch /tmp/sweep_r4a_done
echo "=== part b: wavefront 512^2 s512 rows $(date)"
timeout 5400 python benchmark.py --inproc --append \
  --renderers wavefront --resolutions 512x512 --pairs 10:512 --runs 2
touch /tmp/sweep_r4b_done
echo "=== round-4 append done $(date)"
