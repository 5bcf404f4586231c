#!/bin/bash
# Round-3 measured-run queue, part 5: everything queue4 did not finish
# before its preemption (only the flagship had checkpoints on disk; the
# rest retrain from scratch). Families already rescored at n=5000x3:
# cfg_color_classes, ldm_gray2color, ldm_text_colors. This queue covers
# the remaining six: flagship pixel DDPM (resume 69k -> 100k), EDM,
# unconditional LDM (+ first stage), image-conditional DDPM,
# text-conditional DDPM, EDM2/Karras-MP — plus the encoder-cache FID
# comparison at n=5000 the round-2 verdict asked for (weak #2).
# Sequential — one TPU chip.
#
#   nohup bash scripts/run_measured_queue5.sh > /tmp/queue5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

# 0. Regenerate the gitignored derived datasets (CPU, minutes)
[ -d data/gray2color_32/condition ] || \
  python data/scripts/make_gray2color_pairs.py --n 20000
[ -f data/color_captions_32/text_embeddings.pkl ] || \
  python data/scripts/make_color_captions.py --n 20000

# 1. Flagship pixel DDPM: resume from the preemption checkpoint (step
#    69040) to 100k, rescore, then the encoder-cache FID comparison
#    (k=1/2/3 at n=5000 on the final milestone)
timeout 14400 python train/train_ddpm.py \
    --config train/configs/ddpm_natural32.yaml --resume preempt \
  && timeout 7200 $RESCORE --entry train_ddpm \
       --config train/configs/ddpm_natural32.yaml
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

echo "QUEUE5 DONE"
