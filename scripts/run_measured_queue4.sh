#!/bin/bash
# Round-3 measured-run queue, part 4: the families whose retrain+rescore
# did not complete before the mid-round VM reset (checkpoints and /tmp are
# wiped by a reset; only the git tree and committed results survive).
# Covers the six families still missing an n=5000x3 final-milestone
# rescore: flagship pixel DDPM, EDM, unconditional LDM (+ its first
# stage), image-conditional DDPM, text-conditional DDPM, EDM2/Karras-MP.
# Sequential — one TPU chip.
#
#   nohup bash scripts/run_measured_queue4.sh > /tmp/queue4.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

# 0. Regenerate the gitignored derived datasets (CPU, minutes)
[ -d data/gray2color_32/condition ] || \
  python data/scripts/make_gray2color_pairs.py --n 20000
[ -f data/color_captions_32/text_embeddings.pkl ] || \
  python data/scripts/make_color_captions.py --n 20000

# 1. Flagship pixel DDPM 100k (BASELINE north-star protocol) + rescore
timeout 18000 python train/train_ddpm.py --config train/configs/ddpm_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm --config train/configs/ddpm_natural32.yaml

# 2. EDM 20k + rescore
timeout 10800 python train/train_ddpm.py --config train/configs/edm_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm --config train/configs/edm_natural32.yaml

# 3. First stage (VQ-GAN on natural32) then unconditional LDM 20k + rescore
timeout 10800 python train/train_VAE.py --config train/configs/VAE_natural32.yaml
timeout 10800 python train/train_ldm.py --config train/configs/ldm_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ldm --config train/configs/ldm_natural32.yaml

# 4. Image-conditional DDPM (gray->color) 20k + rescore
timeout 10800 python train/train_ddpm_image_conditional.py \
    --config train/configs/ddpm_image_conditional_gray2color.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm_image_conditional \
       --config train/configs/ddpm_image_conditional_gray2color.yaml

# 5. Text-conditional DDPM (color captions) 20k + rescore
timeout 10800 python train/train_ddpm_text_conditional.py \
    --config train/configs/ddpm_text_conditional_colors.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm_text_conditional \
       --config train/configs/ddpm_text_conditional_colors.yaml

# 6. EDM2 / Karras-MP to 100k (inv-sqrt decay) + rescore
timeout 28800 python train/train_ddpm.py --config train/configs/edm2_karras_natural32.yaml \
  && timeout 5400 $RESCORE --entry train_ddpm --config train/configs/edm2_karras_natural32.yaml

echo "QUEUE4 DONE"
