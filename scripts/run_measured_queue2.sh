#!/bin/bash
# Round-3 measured-run queue, part 2 (resume-aware): continues after the
# partial first pass — VAE_natural32 already trained, CFG resumes from its
# latest milestone. Sequential, one TPU chip.
#
#   nohup bash scripts/run_measured_queue2.sh > /tmp/queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

# 1. CFG class-conditional (resume) + guidance sweep + rescore
timeout 7200 python train/train_ddpm_cfg.py --config train/configs/cfg_color_classes.yaml --resume latest \
  && timeout 3600 python scripts/cfg_guidance_sweep.py \
       --config train/configs/cfg_color_classes.yaml \
       --scales 0 1 2 4 6 8 --n_per_class 64 \
  && timeout 3600 $RESCORE --entry train_ddpm_cfg --config train/configs/cfg_color_classes.yaml

# 2. Cond-side VQ-GAN (gray); target VAE_natural32 finished in part 1
timeout 7200 python train/train_VAE.py --config train/configs/VAE_gray32.yaml

# 3. Dual-VAE image-conditional LDM (VERDICT 3b)
timeout 7200 python train/train_ldm_image_conditional.py \
    --config train/configs/ldm_image_conditional_gray2color.yaml \
  && timeout 3600 $RESCORE --entry train_ldm_image_conditional \
       --config train/configs/ldm_image_conditional_gray2color.yaml

# 4. Text-conditional LDM (VERDICT 3c)
timeout 7200 python train/train_ldm_text_conditional.py \
    --config train/configs/ldm_text_conditional_colors.yaml \
  && timeout 3600 $RESCORE --entry train_ldm_text_conditional \
       --config train/configs/ldm_text_conditional_colors.yaml

# 5. Flagship pixel DDPM 100k (rescore at n=5000)
timeout 14400 python train/train_ddpm.py --config train/configs/ddpm_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm --config train/configs/ddpm_natural32.yaml

# 6. EDM 20k
timeout 7200 python train/train_ddpm.py --config train/configs/edm_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm --config train/configs/edm_natural32.yaml

# 7. EDM2 / Karras-MP with inv-sqrt decay, to 100k (VERDICT 6 closure)
timeout 21600 python train/train_ddpm.py --config train/configs/edm2_karras_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm --config train/configs/edm2_karras_natural32.yaml

echo "QUEUE2 DONE"
