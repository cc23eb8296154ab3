#!/bin/bash
# Round-3 pending benchmark rows (re-launchable; --append keeps rows).
#  (b) reference-resolution headline subset: d10 s32/s128, both
#      engines, both scenes, 1024x1024 + 1920x1080 (VERDICT #7)
#  (a) full megakernel 512^2 re-sweep: the bounce-chunked engine
#      (SRT_MK_CHUNK=6, TPU default) measured 2.76 Mrays/s at sponza
#      d50 vs 0.91 for the unchunked rows in the CSV, so every
#      megakernel row is stale; this also fills the minecraft deep
#      rows the earlier TPU-worker hang interrupted (cap fix landed).
# Ordered safe-first so a worker crash in (a) can't cost (b).
set -x
cd /root/repo
echo "=== part b: reference-resolution rows $(date)"
timeout 16200 python benchmark.py --inproc --append \
  --resolutions 1024x1024 1920x1080 --pairs 10:32 10:128 --runs 2
echo "=== part a: megakernel 512^2 re-sweep (chunked engine) $(date)"
timeout 21600 python benchmark.py --inproc --append \
  --renderers megakernel --resolutions 512x512 \
  --pairs 10:32 10:128 10:256 10:512 20:128 30:128 40:128 50:128 \
  --runs 2
echo "=== sweeps done $(date)"
touch /tmp/sweep_done
