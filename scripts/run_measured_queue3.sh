#!/bin/bash
# Round-3 measured-run queue, part 3: everything remaining, now with uint8
# batch transport (the tunnel's host->device bandwidth collapsed to ~3MB/s
# mid-round; uint8 cuts per-call upload 4x). Resumes partially-trained
# families from their latest milestone.
#
#   nohup bash scripts/run_measured_queue3.sh > /tmp/queue3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

# 1. Dual-VAE image-conditional LDM (resume from ~5000)
timeout 10800 python train/train_ldm_image_conditional.py \
    --config train/configs/ldm_image_conditional_gray2color.yaml --resume latest \
  && timeout 5400 $RESCORE --entry train_ldm_image_conditional \
       --config train/configs/ldm_image_conditional_gray2color.yaml

# 2. Text-conditional LDM
timeout 10800 python train/train_ldm_text_conditional.py \
    --config train/configs/ldm_text_conditional_colors.yaml \
  && timeout 5400 $RESCORE --entry train_ldm_text_conditional \
       --config train/configs/ldm_text_conditional_colors.yaml

# 3. CFG: resume from 7500 -> 20k, guidance sweep, rescore
timeout 10800 python train/train_ddpm_cfg.py \
    --config train/configs/cfg_color_classes.yaml --resume latest \
  && timeout 5400 python scripts/cfg_guidance_sweep.py \
       --config train/configs/cfg_color_classes.yaml \
       --scales 0 1 2 4 6 8 --n_per_class 64 \
  && timeout 5400 $RESCORE --entry train_ddpm_cfg --config train/configs/cfg_color_classes.yaml

# 4. Flagship pixel DDPM 100k
timeout 18000 python train/train_ddpm.py --config train/configs/ddpm_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm --config train/configs/ddpm_natural32.yaml

# 5. EDM 20k
timeout 10800 python train/train_ddpm.py --config train/configs/edm_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm --config train/configs/edm_natural32.yaml

# 6. EDM2 / Karras-MP to 100k
timeout 21600 python train/train_ddpm.py --config train/configs/edm2_karras_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm --config train/configs/edm2_karras_natural32.yaml

echo "QUEUE3 DONE"
