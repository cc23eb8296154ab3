#!/bin/bash
# Round-3 final TPU passes, in priority order:
#   f1: re-measure the one stall-polluted avg row (megakernel sponza
#       1024^2 d10 s128 — run 2 of the d2 sweep hit a ~4470 s worker
#       stall; sibling runs measured 3.68-3.69, the mean shipped 1.91).
#   f2: refresh the megakernel 512^2 matrix at the refined cadence
#       defaults (chunk 3/2 by depth, sort crossover d30) — the
#       committed rows were measured at the first-pass chunk=4
#       defaults (a2a6bbe landed after 7be45f5/2bc946f).
#   f3: one bench.py confirmation run of the headline.
# Re-launchable; --append replaces only matching rows. Each part is
# independently bounded so a late stall cannot eat the round's tail.
set -x
cd /root/repo
echo "=== part f1: re-measure the stalled megakernel row $(date)"
timeout 2400 python benchmark.py --inproc --append \
  --renderers megakernel --scenes sponza_proc \
  --resolutions 1024x1024 --pairs 10:128 --runs 2
# d2's 18000 s timeout fired mid run=2 of its last config, so this
# row kept the pre-cadence value (1.77; the truncated sweep's timed
# runs both measured 2.17) — re-measure it too.
timeout 3600 python benchmark.py --inproc --append \
  --renderers megakernel --scenes minecraft_proc \
  --resolutions 1920x1080 --pairs 10:128 --runs 2
touch /tmp/sweep_f1_done
echo "=== part f2: megakernel 512^2 matrix at refined cadence $(date)"
timeout 7800 python benchmark.py --inproc --append --full \
  --renderers megakernel --resolutions 512x512 --runs 2
touch /tmp/sweep_f2_done
echo "=== part f3: headline confirmation $(date)"
timeout 2400 python bench.py
echo "=== part f done $(date)"
touch /tmp/sweep_f_done
