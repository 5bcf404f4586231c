"""Train an unconditional DDPM from a YAML config.

Entry-point parity with the reference `train/train_ddpm.py`
(YAML schema identical: unet / diffusion / trainer sections).

    python train/train_ddpm.py --config train/configs/ddpm_cifar.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.trainer import Trainer, build_lr_schedule
from diffusion_models_tpu.utils.config import load_config


def build(cfg):
    unet_cfg = cfg["unet"]
    d = cfg["diffusion"]
    # `diffusion.type: elucidated` trains the EDM process (Karras et al.;
    # reference `elucidated_diffusion.py`) through the same Trainer; EDM
    # conditions on continuous log-σ, so the net needs Fourier time features
    diffusion_type = d.get("type", "ddpm")
    dtype = jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32
    post_update_fn = None
    # `unet.type: karras` selects the magnitude-preserving Karras U-Net
    # (EDM2 pairing — reference karras_unet.py); its forced weight norm
    # runs as the Trainer's post_update_fn.
    if unet_cfg.get("type") == "karras":
        from diffusion_models_tpu.models.karras_unet import (
            KarrasUnetND,
            normalize_karras_weights,
        )

        unet = KarrasUnetND(
            image_size=d["image_size"],
            dim=unet_cfg["dim"],
            dim_max=unet_cfg.get("dim_max", 8 * unet_cfg["dim"]),
            channels=unet_cfg.get("channels", 3),
            num_downsamples=unet_cfg.get("num_downsamples", 3),
            num_blocks_per_stage=unet_cfg.get("num_blocks_per_stage", 2),
            attn_res=tuple(unet_cfg.get("attn_res", (16, 8))),
            attn_dim_head=unet_cfg.get("attn_dim_head", 64),
            dropout=unet_cfg.get("dropout", 0.1),
            self_condition=unet_cfg.get("self_condition", False),
            dtype=dtype,
        )
        post_update_fn = normalize_karras_weights
    else:
        unet = Unet(
            dim=unet_cfg["dim"],
            dim_mults=tuple(unet_cfg["dim_mults"]),
            dropout=unet_cfg.get("dropout", 0.0),
            channels=unet_cfg.get("channels", 3),
            self_condition=unet_cfg.get("self_condition", False),
            learned_sinusoidal_cond=unet_cfg.get(
                "learned_sinusoidal_cond", diffusion_type == "elucidated"
            ),
            random_fourier_features=unet_cfg.get("random_fourier_features", False),
            dtype=dtype,
        )

    if diffusion_type == "elucidated":
        from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion

        diffusion = ElucidatedDiffusion(
            unet,
            image_size=d["image_size"],
            channels=unet_cfg.get("channels", 3),
            num_sample_steps=d.get("num_sample_steps", 32),
            sigma_min=d.get("sigma_min", 0.002),
            sigma_max=d.get("sigma_max", 80),
            sigma_data=d.get("sigma_data", 0.5),
            rho=d.get("rho", 7),
            P_mean=d.get("P_mean", -1.2),
            P_std=d.get("P_std", 1.2),
            S_churn=d.get("S_churn", 80),
        )
    else:
        diffusion = GaussianDiffusion(
            unet,
            image_size=d["image_size"],
            timesteps=d["timesteps"],
            sampling_timesteps=d.get("sampling_timesteps"),
            objective=d.get("objective", "pred_noise"),
            beta_schedule=d.get("beta_schedule", "linear"),
            ddpm=d.get("ddpm", True),
            hybrid_loss=d.get("hybrid_loss", False),
            sampling_method=d.get("sampling_method", "ddim"),
        )

    t = cfg["trainer"]
    # inverse-sqrt lr decay (EDM2 recipe, pairs with forced weight norm):
    # lr(step) = train_lr / sqrt(max(1, step / t_ref)). On by default for
    # karras nets; `trainer.lr_decay_tref: 0` disables.
    lr_schedule = lr_schedule_config = None
    t_ref = t.get(
        "lr_decay_tref", 10000 if unet_cfg.get("type") == "karras" else 0
    )
    if t_ref:
        lr_schedule_config = {
            "type": "inv_sqrt",
            "t_ref": float(t_ref),
            "base_lr": float(t["train_lr"]),
        }
        lr_schedule = build_lr_schedule(lr_schedule_config)

    trainer = Trainer(
        diffusion,
        t["data_path"],
        train_batch_size=t["train_batch_size"],
        train_lr=float(t["train_lr"]),
        train_num_steps=t["train_num_steps"],
        gradient_accumulate_every=t.get("gradient_accumulate_every", 1),
        calculate_fid=t.get("calculate_fid", True),
        calculate_is=t.get("calculate_is", False),
        inception_weights=t.get("inception_weights"),
        save_and_sample_every=t["save_and_sample_every"],
        num_fid_samples=t.get("num_fid_samples", 50000),
        num_samples=t.get("num_samples", 25),
        results_folder=t["results_folder"],
        save_best_and_latest_only=t.get("save_best_and_latest_only", False),
        steps_per_call=t.get("steps_per_call", 1),
        post_update_fn=post_update_fn,
        lr_schedule=lr_schedule,
        lr_schedule_config=lr_schedule_config,
    )
    return unet, diffusion, trainer


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config.yaml",
                        help="Path to YAML config file")
    parser.add_argument("--resume", type=str, default=None,
                        help="milestone to resume from (int, 'latest', "
                             "'best', or 'preempt')")
    parser.add_argument("--resume_params_only", action="store_true",
                        help="with --resume: restore params/EMA/step but "
                             "re-initialize the optimizer (needed when the "
                             "optimizer config changed, e.g. a new lr "
                             "schedule)")
    args = parser.parse_args()
    cfg = load_config(args.config)
    unet, diffusion, trainer = build(cfg)

    if args.resume is not None:
        milestone = (
            int(args.resume) if args.resume.isdigit() else args.resume
        )
        trainer.load(milestone, params_only=args.resume_params_only)
        print(f"resumed from milestone {milestone} "
              f"at step {int(trainer.state.step)}"
              + (" (fresh optimizer)" if args.resume_params_only else ""))

    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(trainer.state.params)
    )
    print(f"Total parameters: {n_params}")
    print(f"Devices: {jax.devices()}")
    trainer.train()


if __name__ == "__main__":
    main()
