"""Train an image-conditional DDPM (edge→shoe style) from a YAML config.

Entry-point parity with the reference `train/train_ddpm_image_conditional.py`.

    python train/train_ddpm_image_conditional.py \
        --config train/configs/ddpm_image_conditional_edges2shoes.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.image_conditional import (
    ImageConditionalGaussianDiffusion,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.conditional_trainers import ImageConditionalTrainer
from diffusion_models_tpu.utils.config import load_config


def build(cfg):
    unet_cfg = cfg["unet"]
    unet = Unet(
        dim=unet_cfg["dim"],
        dim_mults=tuple(unet_cfg["dim_mults"]),
        dropout=unet_cfg.get("dropout", 0.0),
        channels=unet_cfg.get("channels", 3),
        cond_channels=unet_cfg.get("cond_channels", 3),
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
    )

    d = cfg["diffusion"]
    t = cfg["trainer"]
    diffusion = ImageConditionalGaussianDiffusion(
        unet,
        image_size=d["image_size"],
        timesteps=d["timesteps"],
        sampling_timesteps=d.get("sampling_timesteps"),
        objective=d.get("objective", "pred_noise"),
        beta_schedule=d.get("beta_schedule", "linear"),
        condition_data_folder=Path(t["data_path"]) / "condition",
    )

    trainer = ImageConditionalTrainer(
        diffusion,
        t["data_path"],
        train_batch_size=t["train_batch_size"],
        train_lr=float(t["train_lr"]),
        train_num_steps=t["train_num_steps"],
        calculate_fid=t.get("calculate_fid", True),
        calculate_is=t.get("calculate_is", False),
        inception_weights=t.get("inception_weights"),
        save_and_sample_every=t["save_and_sample_every"],
        num_fid_samples=t.get("num_fid_samples", 50000),
        num_samples=t.get("num_samples", 25),
        results_folder=t["results_folder"],
        steps_per_call=t.get("steps_per_call", 1),
    )
    return unet, diffusion, trainer


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--resume", type=str, default=None,
                        help="milestone to resume from (int, 'latest', "
                             "'best', or 'preempt')")
    args = parser.parse_args()
    cfg = load_config(args.config)
    unet, diffusion, trainer = build(cfg)
    if args.resume is not None:
        milestone = int(args.resume) if args.resume.isdigit() else args.resume
        trainer.load(milestone)
        print(f"resumed from milestone {milestone} "
              f"at step {int(trainer.state.step)}")
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(trainer.state.params))
    print(f"Total parameters: {n_params}")
    trainer.train()


if __name__ == "__main__":
    main()
