#!/bin/bash
# CFG measured-run trio: resume training to 20k, guidance-scale sweep,
# n=5000 rescore. Split out of run_measured_queue2.sh whose first attempt
# hit the (now fixed) load('latest') gap.
set -x
cd "$(dirname "$0")/.."
timeout 7200 python train/train_ddpm_cfg.py --config train/configs/cfg_color_classes.yaml --resume latest \
  && timeout 3600 python scripts/cfg_guidance_sweep.py \
       --config train/configs/cfg_color_classes.yaml \
       --scales 0 1 2 4 6 8 --n_per_class 64 \
  && timeout 3600 python scripts/rescore_final.py --n 5000 --seeds 101 202 303 \
       --entry train_ddpm_cfg --config train/configs/cfg_color_classes.yaml
echo "CFG TRIO DONE"
