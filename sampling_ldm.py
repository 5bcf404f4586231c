"""Milestone sweep for latent-diffusion checkpoints (uncond + image-cond).

Entry-point parity with the reference `latent-diffusion/sampling.py` and
`latent-diffusion/sampling_image_conditional.py` (one script, `--mode`).

    python sampling_ldm.py --trained_models_folder R \
        --config train/configs/ldm_cifar.yaml --ddim_sampling_timesteps 50
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.latent import (
    ImageConditionalLatentDiffusion,
    LatentDiffusion,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.milestone_sweep import sweep_milestones
from diffusion_models_tpu.utils.config import load_config
from train.train_ldm import load_frozen_vae


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--trained_models_folder", type=str, required=True)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", choices=["uncond", "image_cond"], default="uncond")
    p.add_argument("--condition_folder", type=str, default=None)
    p.add_argument("--images_folder", type=str, default=None)
    p.add_argument("--ddim_sampling_timesteps", type=int, default=10)
    p.add_argument("--num_fid_samples", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--milestones", type=int, nargs="+", default=None,
                   help="restrict the sweep to these milestones")
    args = p.parse_args()

    cfg = load_config(args.config)
    unet_cfg = cfg["unet"]

    if args.mode == "uncond":
        vae = load_frozen_vae(cfg)
        _, h, w, c = vae.z_shape
        unet = Unet(
            dim=unet_cfg["dim"], dim_mults=tuple(unet_cfg["dim_mults"]),
            channels=c, dtype=jnp.bfloat16,
        )
        diffusion = LatentDiffusion(
            unet, vae, latent_shape=(h, w, c),
            timesteps=cfg.get("diffusion_timesteps", 1000),
            sampling_timesteps=args.ddim_sampling_timesteps,
        )
        cond_provider = None
    else:
        vae = load_frozen_vae(
            {**cfg, "vae_checkpoint_path": cfg["target_vae_checkpoint_path"],
             "vae_milestone": cfg.get("target_vae_milestone")}
        )
        cond_vae = vae
        if cfg.get("cond_vae_checkpoint_path"):
            cond_vae = load_frozen_vae(
                {**cfg, "vae_checkpoint_path": cfg["cond_vae_checkpoint_path"],
                 "vae_milestone": cfg.get("cond_vae_milestone")}
            )
        _, h, w, c = vae.z_shape
        unet = Unet(
            dim=unet_cfg["dim"], dim_mults=tuple(unet_cfg["dim_mults"]),
            channels=c, cond_channels=cond_vae.z_shape[-1], dtype=jnp.bfloat16,
        )
        diffusion = ImageConditionalLatentDiffusion(
            unet, vae, latent_shape=(h, w, c), cond_vae=cond_vae,
            condition_data_folder=args.condition_folder,
            timesteps=cfg.get("diffusion_timesteps", 1000),
            sampling_timesteps=args.ddim_sampling_timesteps,
        )

        def cond_provider(n, np_rng):
            pixels = diffusion.get_random_condition(n, np_rng)
            return np.asarray(diffusion.encode_cond(jnp.asarray(pixels)))

    fid_scorer = None
    if args.num_fid_samples and args.images_folder:
        from diffusion_models_tpu.training.evaluation import FIDEvaluation
        from diffusion_models_tpu.utils.data import ImageFolderDataset

        fid_scorer = FIDEvaluation(
            batch_size=args.batch_size,
            data_loader=ImageFolderDataset(
                args.images_folder, diffusion.pixel_image_size
            ),
            stats_dir=args.trained_models_folder,
            num_fid_samples=args.num_fid_samples,
            weights_path=args.inception_weights,
        )

    sweep_milestones(
        diffusion, args.trained_models_folder,
        cond_provider=cond_provider, num_samples=args.num_samples,
        num_fid_samples=args.num_fid_samples, batch_size=args.batch_size,
        fid_scorer=fid_scorer, milestones=args.milestones,
    )


if __name__ == "__main__":
    main()
