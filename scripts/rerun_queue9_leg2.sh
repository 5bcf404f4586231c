#!/bin/bash
# Re-run queue9 leg 2 (unconditional VQ-GAN -> LDM -> rescore), which died
# at compile with the fused-kernel scoped-VMEM OOM on the latent-Unet shape
# (see docs/ROUND4_NOTES.md). Waits for the main queue to finish, ships the
# fixed kernel into the /tmp/q9 snapshot, and reuses the already-trained
# first-stage VQ-GAN from the original leg-2 attempt.
set -x
cd /tmp/q9

# wait for queue9 to release the chip
while kill -0 "$(cat /tmp/queue9.pid)" 2>/dev/null; do sleep 60; done

# ship the VMEM-budget fix (small-n cap) into the snapshot
cp /root/repo/diffusion_models_tpu/ops/pallas/linear_attn_block.py \
   diffusion_models_tpu/ops/pallas/linear_attn_block.py

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

# first stage already trained in the original attempt; retrain only if absent
[ -d results/VAE/natural32_32_to_16 ] || \
  timeout 3600 python train/train_VAE.py --config train/configs/VAE_natural32.yaml

timeout 5400 python train/train_ldm.py --config train/configs/ldm_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ldm --config train/configs/ldm_natural32.yaml

echo "LEG2 RERUN DONE"
