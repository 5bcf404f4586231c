#!/bin/bash
# Round-3 measured-run queue, part 7: the mid-round VM restart wiped every
# checkpoint again; four families still lack n=5000x3 final-milestone
# rescores. Retrain + rescore them, shortest first so results land
# incrementally: image-conditional DDPM, text-conditional DDPM,
# VQ-GAN -> unconditional LDM, then EDM2/Karras-MP 100k (longest last).
#
#   nohup bash scripts/run_measured_queue7.sh > /tmp/queue7.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

[ -d data/gray2color_32/condition ] || \
  python data/scripts/make_gray2color_pairs.py --n 20000
[ -f data/color_captions_32/text_embeddings.pkl ] || \
  python data/scripts/make_color_captions.py --n 20000

# 1. Image-conditional DDPM (gray->color) 20k + rescore
timeout 10800 python train/train_ddpm_image_conditional.py \
    --config train/configs/ddpm_image_conditional_gray2color.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm_image_conditional \
       --config train/configs/ddpm_image_conditional_gray2color.yaml

# 2. Text-conditional DDPM (color captions) 20k + rescore
timeout 10800 python train/train_ddpm_text_conditional.py \
    --config train/configs/ddpm_text_conditional_colors.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm_text_conditional \
       --config train/configs/ddpm_text_conditional_colors.yaml

# 3. First stage (VQ-GAN on natural32) then unconditional LDM 20k + rescore
timeout 10800 python train/train_VAE.py --config train/configs/VAE_natural32.yaml \
  && timeout 10800 python train/train_ldm.py --config train/configs/ldm_natural32.yaml \
  && timeout 7200 $RESCORE --entry train_ldm --config train/configs/ldm_natural32.yaml

# 4. EDM2 / Karras-MP to 100k (inv-sqrt decay) + rescore
timeout 28800 python train/train_ddpm.py --config train/configs/edm2_karras_natural32.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm --config train/configs/edm2_karras_natural32.yaml

echo "QUEUE7 DONE"
