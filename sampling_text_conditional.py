"""Milestone sweep for text-conditional DDPM checkpoints.

Entry-point parity with the reference
`denoising-diffusion-pytorch/sampling_text_conditional.py` — which is broken
as shipped (stale `ddpm_text_new` import, `sampling_text_conditional.py:14`,
on SURVEY.md's do-not-replicate list); this one works.

    python sampling_text_conditional.py --trained_models_folder R \
        --config train/configs/ddpm_text_conditional_coco.yaml \
        --embedding_file data/coco/text_embeddings.pkl
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax.numpy as jnp

from diffusion_models_tpu.diffusion.text_conditional import (
    TextConditionalGaussianDiffusion,
)
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.milestone_sweep import sweep_milestones
from diffusion_models_tpu.utils.config import load_config


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--trained_models_folder", type=str, required=True)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--embedding_file", type=str, required=True)
    p.add_argument("--images_folder", type=str, default=None)
    p.add_argument("--ddim_sampling_timesteps", type=int, default=10)
    p.add_argument("--num_fid_samples", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--milestones", type=int, nargs="+", default=None,
                   help="restrict the sweep to these milestones")
    args = p.parse_args()

    cfg = load_config(args.config)
    unet_cfg, d = cfg["unet"], cfg["diffusion"]
    unet = Unet(
        dim=unet_cfg["dim"], dim_mults=tuple(unet_cfg["dim_mults"]),
        channels=unet_cfg.get("channels", 3), text_condition=True,
        text_emb_dim=unet_cfg.get("text_emb_dim", 512),
        use_cross_attn=unet_cfg.get("use_cross_attn", False),
        dtype=jnp.bfloat16,
    )
    diffusion = TextConditionalGaussianDiffusion(
        unet, image_size=d["image_size"], timesteps=d["timesteps"],
        sampling_timesteps=args.ddim_sampling_timesteps,
        embeddings_file=args.embedding_file,
        text_emb_dim=unet_cfg.get("text_emb_dim", 512),
    )

    def cond_provider(n, np_rng):
        _, embs = diffusion.get_random_text(n, np_rng)
        return embs

    fid_scorer = None
    if args.num_fid_samples and args.images_folder:
        from diffusion_models_tpu.training.evaluation import FIDEvaluation
        from diffusion_models_tpu.utils.data import ImageFolderDataset

        fid_scorer = FIDEvaluation(
            batch_size=args.batch_size,
            data_loader=ImageFolderDataset(args.images_folder, d["image_size"]),
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
