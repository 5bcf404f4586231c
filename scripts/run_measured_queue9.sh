#!/bin/bash
# Round-4 measured-run queue: close the two "—" rows in the nine-family
# table (round-3 verdict item 1) and put a quality number on
# DPM-Solver++(2M) (item 6). The round-3 VM restarts wiped every trained
# checkpoint, so each leg retrains before rescoring. Runs from a snapshot
# copy of the repo (scripts/launch_queue9.sh) so concurrent code edits in
# /root/repo cannot break a later leg.
#
# Legs, shortest-to-land first:
#   1. EDM2/Karras-MP at the clearly-labelled 30k budget -> rescore
#   2. VQ-GAN first stage (10k) -> unconditional LDM (20k) -> rescore
#   3. Flagship DDPM 100k retrain -> DDIM-50 rescore (refreshes the
#      headline WITH the new IS fields) -> DPM++(2M) rescores at
#      10/15/25 steps on the SAME checkpoint -> merged dpmpp_rescore.json
#
# All rescores: n=5000 x 3 seeds, now emitting FID+IS per seed.
set -x
cd "$(dirname "$0")/.."

RESCORE="python scripts/rescore_final.py --n 5000 --seeds 101 202 303"

[ -d data/natural_patches_32/train_images ] || \
  python data/scripts/make_natural_patches.py --num 20000

# 1. EDM2 / Karras-MP, reduced 30k (inv-sqrt decay) + rescore
timeout 7200 python train/train_ddpm.py \
    --config train/configs/edm2_karras_natural32_30k.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm \
       --config train/configs/edm2_karras_natural32_30k.yaml
touch results/edm2_karras_natural32_30k/.leg_done

# 2. First stage (VQ-GAN on natural32) then unconditional LDM 20k + rescore
timeout 3600 python train/train_VAE.py --config train/configs/VAE_natural32.yaml \
  && timeout 3600 python train/train_ldm.py --config train/configs/ldm_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ldm --config train/configs/ldm_natural32.yaml
touch results/ldm_natural32/.leg_done

# 3. Flagship DDPM 100k retrain, DDIM-50 headline rescore, then DPM++(2M)
#    at 10/15/25 steps on the same checkpoint (verdict item 6)
timeout 7200 python train/train_ddpm.py --config train/configs/ddpm_natural32.yaml \
  && timeout 3600 $RESCORE --entry train_ddpm \
       --config train/configs/ddpm_natural32.yaml \
  && for S in 10 15 25; do \
       timeout 1800 $RESCORE --entry train_ddpm \
         --config train/configs/ddpm_natural32.yaml \
         --sampling_method dpmpp --sampling_timesteps $S \
         --out results/ddpm_natural32/dpmpp_rescore_${S}.json; \
     done \
  && python - <<'EOF'
import json
from pathlib import Path
root = Path("results/ddpm_natural32")
merged = {
    "protocol": "n=5000 x 3 seeds, same 100k checkpoint as rescore.json",
    "ddim_50": json.loads((root / "rescore.json").read_text()),
    "dpmpp": {s: json.loads((root / f"dpmpp_rescore_{s}.json").read_text())
              for s in (10, 15, 25)
              if (root / f"dpmpp_rescore_{s}.json").exists()},
}
(root / "dpmpp_rescore.json").write_text(json.dumps(merged, indent=2))
print("merged dpmpp_rescore.json")
EOF
touch results/ddpm_natural32/.leg_done

echo "QUEUE9 DONE"
