"""Train an unconditional latent diffusion model from a YAML config.

Entry-point parity with the reference `latent-diffusion/train/train_ldm.py`:
load a trained VQ-VAE checkpoint, freeze it, diffuse in its latent space
(latent shape from `decoder.z_shape`), reuse the base Trainer on a pixel
folder (encoding happens inside the loss).

    python train/train_ldm.py --config train/configs/ldm_cifar.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.latent import LatentDiffusion, _FrozenVAE
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.models.vae import VQModel
from diffusion_models_tpu.training.trainer import Trainer
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.config import load_config


def load_frozen_vae(cfg):
    dd = dict(cfg["ddconfig"])
    dd["ch_mult"] = tuple(dd["ch_mult"])
    vae = VQModel(ddconfig=dd, n_embed=cfg["n_embed"], embed_dim=cfg["embed_dim"])
    # restore g_params from a VAETrainer checkpoint
    ckpt = CheckpointManager(cfg["vae_checkpoint_path"])
    milestones = ckpt.milestones()
    assert milestones, f"no VAE checkpoints under {cfg['vae_checkpoint_path']}"
    milestone = cfg.get("vae_milestone") or milestones[-1]
    x0 = jnp.zeros((1, dd["resolution"], dd["resolution"], dd["in_channels"]))
    template_params = vae.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    # partial restore: the frozen first stage needs only the generator params
    restored = ckpt.restore(
        milestone, {"g_params": template_params}, partial=True
    )
    return _FrozenVAE(vae, restored["g_params"])


def build(cfg):
    vae = load_frozen_vae(cfg)
    _, h, w, c = vae.z_shape

    unet_cfg = cfg["unet"]
    unet = Unet(
        dim=unet_cfg["dim"],
        dim_mults=tuple(unet_cfg["dim_mults"]),
        dropout=unet_cfg.get("dropout", 0.0),
        channels=c,
        dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32,
    )

    diffusion = LatentDiffusion(
        unet,
        vae,
        latent_shape=(h, w, c),
        timesteps=cfg.get("diffusion_timesteps", 1000),
        sampling_timesteps=cfg.get("sampling_timesteps"),
    )

    t = cfg["trainer"]
    trainer = Trainer(
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
    return diffusion, trainer


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
    diffusion, trainer = build(cfg)
    if args.resume is not None:
        milestone = int(args.resume) if args.resume.isdigit() else args.resume
        trainer.load(milestone)
        print(f"resumed from milestone {milestone} "
              f"at step {int(trainer.state.step)}")
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(trainer.state.params))
    print(f"Denoiser parameters: {n_params}; latent shape {diffusion.image_size}")
    trainer.train()


if __name__ == "__main__":
    main()
