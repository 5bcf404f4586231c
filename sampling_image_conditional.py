"""Milestone sweep for image-conditional DDPM checkpoints.

Entry-point parity with the reference
`denoising-diffusion-pytorch/sampling_image_conditional.py` (milestone
enumeration, EMA-only load, cond‖sample grids, FID on targets).

    python sampling_image_conditional.py --trained_models_folder R \
        --config train/configs/ddpm_image_conditional_edges2shoes.yaml \
        --images_folder data/edges2shoes --ddim_sampling_timesteps 50
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.image_conditional import (
    ImageConditionalGaussianDiffusion,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.milestone_sweep import sweep_milestones
from diffusion_models_tpu.utils.config import load_config
from diffusion_models_tpu.utils.data import ImageConditionalDataset


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--trained_models_folder", type=str, required=True)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--images_folder", type=str, default=None,
                   help="paired dataset root (condition/ + target/)")
    p.add_argument("--ddim_sampling_timesteps", type=int, default=10)
    p.add_argument("--num_fid_samples", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--milestones", type=int, nargs="+", default=None,
                   help="restrict the sweep to these milestones")
    args = p.parse_args()

    cfg = load_config(args.config)
    unet_cfg, d = cfg["unet"], cfg["diffusion"]
    unet = Unet(
        dim=unet_cfg["dim"], dim_mults=tuple(unet_cfg["dim_mults"]),
        channels=unet_cfg.get("channels", 3),
        cond_channels=unet_cfg.get("cond_channels", 3), dtype=jnp.bfloat16,
    )
    diffusion = ImageConditionalGaussianDiffusion(
        unet, image_size=d["image_size"], timesteps=d["timesteps"],
        sampling_timesteps=args.ddim_sampling_timesteps,
        sampling_method=args.sampler,
    )

    dataset = cond_provider = fid_scorer = None
    if args.images_folder:
        dataset = ImageConditionalDataset(args.images_folder, d["image_size"])

        def cond_provider(n, np_rng):
            idxs = np_rng.integers(len(dataset), size=n)
            return np.stack([dataset.get(int(i))[1] for i in idxs])

        if args.num_fid_samples:
            from diffusion_models_tpu.training.evaluation import FIDEvaluation

            fid_scorer = FIDEvaluation(
                batch_size=args.batch_size, data_loader=dataset,
                stats_dir=args.trained_models_folder,
                num_fid_samples=args.num_fid_samples,
                weights_path=args.inception_weights,
            )

    sweep_milestones(
        diffusion, args.trained_models_folder,
        cond_provider=cond_provider, num_samples=args.num_samples,
        num_fid_samples=args.num_fid_samples, batch_size=args.batch_size,
        fid_scorer=fid_scorer, grid_with_cond=True,
        milestones=args.milestones,
    )


if __name__ == "__main__":
    main()
