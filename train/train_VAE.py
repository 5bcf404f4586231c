"""Train the VQ-VAE first stage from a YAML config.

Entry-point parity with the reference `latent-diffusion/train/train_VAE.py`
(same ddconfig/lossconfig YAML schema, `VAE_cifar.yaml`), with the Lightning
loop replaced by the JAX two-optimizer `VAETrainer`.

    python train/train_VAE.py --config train/configs/VAE_cifar.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from diffusion_models_tpu.models.vae import AutoencoderKL, VQModel
from diffusion_models_tpu.training.vae_losses import (
    LPIPSWithDiscriminator,
    VQLPIPSWithDiscriminator,
)
from diffusion_models_tpu.training.vae_trainer import VAETrainer
from diffusion_models_tpu.utils.config import load_config


def build(cfg):
    dd = dict(cfg["ddconfig"])
    dd["ch_mult"] = tuple(dd["ch_mult"])
    # `model_type: kl` selects the KL-regularized AutoencoderKL first stage
    # (reference target `ldm.models.autoencoder.AutoencoderKL`,
    # `autoencoder.py:339-478`); default is the VQ-GAN.
    model_type = cfg.get("model_type", "vq")
    if model_type == "kl":
        model = AutoencoderKL(ddconfig=dd, embed_dim=cfg["embed_dim"])
    elif model_type == "vq":
        model = VQModel(
            ddconfig=dd,
            n_embed=cfg["n_embed"],
            embed_dim=cfg["embed_dim"],
        )
    else:
        raise ValueError(f"unknown model_type {model_type!r} (vq|kl)")

    loss_params = dict(cfg.get("lossconfig", {}).get("params", {}))
    lpips = None
    lpips_weights = loss_params.pop("lpips_weights", None)
    if lpips_weights:
        from diffusion_models_tpu.models.lpips import LPIPS

        lpips = LPIPS.load_torch_state_dict(lpips_weights)
    if model_type == "kl":
        loss_params.pop("codebook_weight", None)
        loss = LPIPSWithDiscriminator(lpips=lpips, **loss_params)
    else:
        loss = VQLPIPSWithDiscriminator(lpips=lpips, **loss_params)

    trainer = VAETrainer(
        model,
        cfg["train_images_path"],
        cfg.get("val_images_path"),
        loss=loss,
        batch_size=cfg["batch_size"],
        learning_rate=float(cfg["base_learning_rate"]),
        train_num_steps=cfg.get("train_num_steps", 100000),
        sample_every=cfg.get("sample_every", 1000),
        save_every=cfg.get("save_every", 1000),
        results_folder=cfg.get("checkpoints_path", "results/vae"),
        num_workers=cfg.get("num_workers", 8),
    )
    return model, trainer


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config.yaml")
    args = parser.parse_args()
    cfg = load_config(args.config)
    model, trainer = build(cfg)
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(trainer.state.g_params)
    )
    print(f"VQModel parameters: {n_params}")
    trainer.train()


if __name__ == "__main__":
    main()
