#!/bin/bash
# Round-3 measured-run queue, part 8: another VM restart killed queue7
# mid-flight (its image-conditional leg finished and is committed; the
# rest never ran and /tmp was wiped). Three families still lack n=5000x3
# final-milestone rescores. Shortest first so results land incrementally:
# text-conditional DDPM, VQ-GAN -> unconditional LDM, then EDM2/Karras-MP
# at a reduced 30k steps (the 100k closure metrics are committed from the
# earlier session; 100k does not fit the remaining wall clock at ~30
# steps/s, so the error-bar rescore runs on a clearly-labelled 30k
# retrain in its own results folder).
#
#   nohup bash scripts/run_measured_queue8.sh > /tmp/queue8.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

[ -d data/natural_patches_32/train_images ] || \
  python data/scripts/make_natural_patches.py --n 20000
[ -f data/color_captions_32/text_embeddings.pkl ] || \
  python data/scripts/make_color_captions.py --n 20000

# 1. Text-conditional DDPM (color captions) 20k + rescore
timeout 3600 python train/train_ddpm_text_conditional.py \
    --config train/configs/ddpm_text_conditional_colors.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm_text_conditional \
       --config train/configs/ddpm_text_conditional_colors.yaml

# 2. First stage (VQ-GAN on natural32) then unconditional LDM 20k + rescore
timeout 3600 python train/train_VAE.py --config train/configs/VAE_natural32.yaml \
  && timeout 3600 python train/train_ldm.py --config train/configs/ldm_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ldm --config train/configs/ldm_natural32.yaml

# 3. EDM2 / Karras-MP, reduced 30k (inv-sqrt decay) + rescore
timeout 7200 python train/train_ddpm.py \
    --config train/configs/edm2_karras_natural32_30k.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm \
       --config train/configs/edm2_karras_natural32_30k.yaml

echo "QUEUE8 DONE"
