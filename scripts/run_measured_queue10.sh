#!/bin/bash
# Round-5 measured-run queue: the converged EDM2/Karras-MP number
# (round-4 VERDICT item 2). One leg: retrain edm2_karras_natural32 to
# 100k with milestone checkpoints every 5k (so a VM reset costs at most
# 5k steps), then rescore the final milestone at n=5000 x 3 seeds.
#
# Unlike queue9, results land DIRECTLY in /root/repo/results (the
# launcher symlinks the snapshot's results dir there) — /tmp has been
# wiped by VM restarts twice; never again stage finished numbers there.
set -x
cd "$(dirname "$0")/.."

CFG=train/configs/edm2_karras_natural32_100k.yaml

[ -d data/natural_patches_32/train_images ] || \
  python data/scripts/make_natural_patches.py --num 20000

timeout 18000 python train/train_ddpm.py --config $CFG \
  && timeout 5400 python scripts/rescore_final.py --n 5000 \
       --seeds 101 202 303 --entry train_ddpm --config $CFG \
  && touch results/edm2_karras_natural32_100k/.leg_done

echo "QUEUE10 DONE"
