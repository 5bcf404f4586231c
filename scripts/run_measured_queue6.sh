#!/bin/bash
# Round-3 measured-run queue, part 6: continuation of queue5 after the
# per-head-max VMEM regression was fixed (the flagship 100k training
# completed in queue5; its rescore and the enc-cache sweeps crashed on a
# scoped-VMEM compile OOM that the strict batch-tile budget now avoids).
# Runs: flagship rescore + enc k=1/2/3 sweeps, then EDM, VAE->LDM,
# image-conditional, text-conditional, EDM2 — each retrain + n=5000x3
# rescore. Sequential — one TPU chip.
#
#   nohup bash scripts/run_measured_queue6.sh > /tmp/queue6.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

[ -d data/gray2color_32/condition ] || \
  python data/scripts/make_gray2color_pairs.py --n 20000
[ -f data/color_captions_32/text_embeddings.pkl ] || \
  python data/scripts/make_color_captions.py --n 20000

# 1. Flagship rescore (training already at 100k) + enc-cache comparison
timeout 7200 $RESCORE --entry train_ddpm --config train/configs/ddpm_natural32.yaml
for K in 1 2 3; do
  timeout 3600 python sampling.py \
    --trained_models_folder results/ddpm_natural32 \
    --config train/configs/ddpm_natural32.yaml \
    --milestones 10 --ddim_sampling_timesteps 50 \
    --num_fid_samples 5000 --encoder_cache_interval $K \
    --images_folder data/natural_patches_32/train_images \
    --images_save_folder results/ddpm_natural32/sampling_enc${K}_n5000
done

# 2. EDM 20k + rescore
timeout 10800 python train/train_ddpm.py --config train/configs/edm_natural32.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm --config train/configs/edm_natural32.yaml

# 3. First stage (VQ-GAN on natural32) then unconditional LDM 20k + rescore
timeout 10800 python train/train_VAE.py --config train/configs/VAE_natural32.yaml \
  && timeout 10800 python train/train_ldm.py --config train/configs/ldm_natural32.yaml \
  && timeout 7200 $RESCORE --entry train_ldm --config train/configs/ldm_natural32.yaml

# 4. Image-conditional DDPM (gray->color) 20k + rescore
timeout 10800 python train/train_ddpm_image_conditional.py \
    --config train/configs/ddpm_image_conditional_gray2color.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm_image_conditional \
       --config train/configs/ddpm_image_conditional_gray2color.yaml

# 5. Text-conditional DDPM (color captions) 20k + rescore
timeout 10800 python train/train_ddpm_text_conditional.py \
    --config train/configs/ddpm_text_conditional_colors.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm_text_conditional \
       --config train/configs/ddpm_text_conditional_colors.yaml

# 6. EDM2 / Karras-MP to 100k (inv-sqrt decay) + rescore
timeout 28800 python train/train_ddpm.py --config train/configs/edm2_karras_natural32.yaml \
  && timeout 7200 $RESCORE --entry train_ddpm --config train/configs/edm2_karras_natural32.yaml

echo "QUEUE6 DONE"
