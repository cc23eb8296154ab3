#!/bin/bash
# Round-3 pending benchmark rows (re-launchable; --append keeps rows).
#  (b) reference-resolution headline subset: d10 s32/s128, both
#      engines, both scenes, 1024x1024 + 1920x1080 (VERDICT #7)
#  (a) megakernel-minecraft deep rows at 512^2 that the earlier
#      TPU-worker hang interrupted (watchdog cap fix has landed)
# Ordered safe-first so a worker crash in (a) can't cost (b).
set -x
cd /root/repo
echo "=== part b: reference-resolution rows $(date)"
timeout 16200 python benchmark.py --inproc --append \
  --resolutions 1024x1024 1920x1080 --pairs 10:32 10:128 --runs 2
echo "=== part a: megakernel minecraft deep rows $(date)"
timeout 10800 python benchmark.py --inproc --append \
  --renderers megakernel --scenes minecraft_proc \
  --resolutions 512x512 \
  --pairs 30:128 40:128 50:128 10:32 10:256 10:512 --runs 3
echo "=== sweeps done $(date)"
touch /tmp/sweep_done
