#!/bin/bash
# Round-3g: re-measure every WAVEFRONT row after the adaptive wave
# sizing landed (one whole-frame wave when spp x pixels <= ~68M rays,
# else 32M waves — measured +11% at the headline config,
# tools/probe_wave_size.py). Megakernel rows are untouched (its wave
# logic is lane-bounce-capped, separate knob).
# Re-launchable; --append replaces only matching rows. Ordered
# headline-first so a late stall cannot eat the important rows.
set -x
cd /root/repo
echo "=== part g1: wavefront reference-resolution rows $(date)"
timeout 7200 python benchmark.py --inproc --append \
  --renderers wavefront --resolutions 1024x1024 1920x1080 \
  --pairs 10:32 10:128 --runs 2
touch /tmp/sweep_g1_done
echo "=== part g2: wavefront 512^2 matrix $(date)"
timeout 14400 python benchmark.py --inproc --append \
  --renderers wavefront --resolutions 512x512 --full --runs 2
touch /tmp/sweep_g2_done
echo "=== part g done $(date)"
