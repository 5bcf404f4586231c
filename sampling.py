"""Milestone sampling/eval sweeper for unconditional DDPM checkpoints.

Entry-point parity with the reference `denoising-diffusion-pytorch/sampling.py`:
enumerate `model-<N>` milestones in a results folder, load the EMA weights,
save a 25-image sample grid, generate `num_fid_samples` fakes, and score
FID/IS into TensorBoard.

Unlike the reference (which hardcodes U-Net hyperparameters, `sampling.py:
18-28`), the model is rebuilt from the run's own `training_params.json` or an
explicit `--config` YAML.

    python sampling.py --trained_models_folder results/results_ddpm_cifar \
        --images_folder data/cifar-10/train_images \
        --ddim_sampling_timesteps 50 --num_fid_samples 1000
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.config import load_config
from diffusion_models_tpu.utils.data import ImageFolderDataset
from diffusion_models_tpu.utils.helpers import num_to_groups
from diffusion_models_tpu.utils.image import save_image_grid
from diffusion_models_tpu.utils.logging import MetricWriter


def build_diffusion(args):
    if args.config:
        cfg = load_config(args.config)
        unet_cfg, d = cfg["unet"], cfg["diffusion"]
    else:
        tp = json.loads(
            (Path(args.trained_models_folder) / "training_params.json").read_text()
        )
        unet_cfg = {
            "dim": tp.get("unet_dim", 64),
            "dim_mults": tp.get("unet_dim_mults", [1, 2, 4, 8]),
            "channels": tp.get("channels", 3),
        }
        # the run's recorded process config — a run trained with pred_v /
        # a non-linear schedule must be swept with the same settings or the
        # samples are silently garbage
        d = {
            "image_size": tp["image_size"][0],
            "timesteps": tp["timesteps"],
            "objective": tp.get("objective", "pred_noise"),
            "beta_schedule": tp.get("beta_schedule", "linear"),
        }

    unet = Unet(
        dim=unet_cfg["dim"],
        dim_mults=tuple(unet_cfg["dim_mults"]),
        channels=unet_cfg.get("channels", 3),
        dtype=jnp.bfloat16,
    )
    return GaussianDiffusion(
        unet,
        image_size=d["image_size"],
        timesteps=d["timesteps"],
        sampling_timesteps=args.ddim_sampling_timesteps,
        objective=d.get("objective", "pred_noise"),
        beta_schedule=d.get("beta_schedule", "linear"),
    )


def main():
    from diffusion_models_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--trained_models_folder", type=str, required=True)
    p.add_argument("--images_folder", type=str, default=None,
                   help="real dataset folder for FID stats")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config used for training (model rebuild)")
    p.add_argument("--ddim_sampling_timesteps", type=int, default=10)
    p.add_argument("--num_fid_samples", type=int, default=1000)
    p.add_argument("--num_samples", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--calculate_fid", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--calculate_is", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--images_save_folder", type=str, default=None)
    p.add_argument("--sampler", choices=["ddim", "dpmpp"], default="ddim",
                   help="dpmpp = DPM-Solver++(2M): DDIM-50-level quality at "
                        "10-15 steps (deterministic, same time grid)")
    p.add_argument("--encoder_cache_interval", type=int, default=1,
                   help=">1 enables encoder-propagation fast sampling "
                        "(arXiv:2312.09608): down-path runs every k-th step")
    p.add_argument("--milestones", type=int, nargs="+", default=None,
                   help="restrict the sweep to these milestones "
                        "(default: all found in the results folder)")
    args = p.parse_args()

    results = Path(args.trained_models_folder)
    out_dir = Path(args.images_save_folder or results / "sampling")
    out_dir.mkdir(parents=True, exist_ok=True)
    writer = MetricWriter(out_dir / "tensorboard_logs")

    diffusion = build_diffusion(args)
    params_template = diffusion.init(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(results)

    # ONE compiled sampler program for the whole sweep: always run at
    # batch_size and slice remainders on the host (a per-n static jit would
    # recompile for the grid size and the last FID chunk — minutes each on TPU)
    @jax.jit
    def _sample_batch(params, rng):
        if args.sampler == "dpmpp":
            return diffusion.dpmpp_sample(
                params, rng, diffusion.sample_shape(args.batch_size),
                sampling_timesteps=args.ddim_sampling_timesteps,
            )
        return diffusion.ddim_sample(
            params, rng, diffusion.sample_shape(args.batch_size),
            sampling_timesteps=args.ddim_sampling_timesteps,
            encoder_cache_interval=args.encoder_cache_interval,
        )

    def sample_n(params, rng, total):
        chunks = []
        for n in num_to_groups(total, args.batch_size):
            rng, key = jax.random.split(rng)
            chunks.append(np.asarray(_sample_batch(params, key)[:n]))
        return np.concatenate(chunks, axis=0), rng

    fid_scorer = is_scorer = None
    if args.calculate_fid and args.images_folder:
        from diffusion_models_tpu.training.evaluation import FIDEvaluation

        ds = ImageFolderDataset(args.images_folder, diffusion.image_size)
        fid_scorer = FIDEvaluation(
            batch_size=args.batch_size, data_loader=ds, stats_dir=results,
            num_fid_samples=args.num_fid_samples,
            weights_path=args.inception_weights,
        )
    if args.calculate_is:
        from diffusion_models_tpu.training.evaluation import InceptionScoreEvaluation

        is_scorer = InceptionScoreEvaluation(
            batch_size=args.batch_size,
            log_file=out_dir / "inception_score_log.txt",
            weights_path=args.inception_weights,
        )

    milestones = ckpt.milestones()
    print(f"found milestones: {milestones}")
    if args.milestones is not None:
        milestones = [m for m in milestones if m in set(args.milestones)]
        print(f"sweeping milestones: {milestones}")
    # partial restore: sampling needs only the EMA weights + step
    template = {
        "step": jnp.zeros((), jnp.int32),
        "ema_params": params_template,
        "ema_step": jnp.zeros((), jnp.int32),
    }

    for milestone in milestones:
        restored = ckpt.restore(milestone, template, partial=True)
        # sampling uses ONLY the EMA weights (reference `sampling.py:157-158`)
        ema_params = restored["ema_params"]
        rng = jax.random.PRNGKey(milestone)

        grid, rng = sample_n(ema_params, rng, args.num_samples)
        save_image_grid(
            grid, out_dir / f"sample-{milestone}.png",
            nrow=int(np.sqrt(args.num_samples)),
        )
        writer.image("Samples", grid[0], milestone)

        if fid_scorer or is_scorer:
            fakes, rng = sample_n(ema_params, rng, args.num_fid_samples)
            if fid_scorer:
                fid = fid_scorer.fid_score(fakes)
                print(f"milestone {milestone}: FID {fid:.3f}")
                writer.scalar("Eval/FID", fid, milestone)
            if is_scorer:
                is_mean, _ = is_scorer.calculate_inception_score(fakes)
                print(f"milestone {milestone}: IS {is_mean:.3f}")
                writer.scalar("Eval/IS", is_mean, milestone)

    writer.close()


if __name__ == "__main__":
    main()
