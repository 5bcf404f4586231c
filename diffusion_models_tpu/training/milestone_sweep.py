"""Shared milestone-sweep logic for the sampling/eval CLI scripts.

The reference repeats ~250 lines of sweep code per script
(`denoising-diffusion-pytorch/sampling*.py`, `latent-diffusion/sampling*.py`);
this helper holds it once: enumerate `model-<N>` checkpoints, restore ONLY
the EMA weights (reference loads only EMA, `sampling.py:157-158`), draw
sample grids, generate fakes, score FID/IS, log to TensorBoard.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.utils.checkpoint import CheckpointManager
from diffusion_models_tpu.utils.helpers import num_to_groups
from diffusion_models_tpu.utils.image import save_image_grid
from diffusion_models_tpu.utils.logging import MetricWriter


def sweep_milestones(
    diffusion,
    results_folder,
    *,
    out_dir=None,
    sample_fn: Optional[Callable] = None,
    cond_provider: Optional[Callable] = None,
    num_samples: int = 25,
    num_fid_samples: int = 0,
    batch_size: int = 64,
    fid_scorer=None,
    is_scorer=None,
    grid_with_cond: bool = False,
    milestones=None,
):
    """Run the sweep.

    sample_fn(ema_params, rng, n, cond) -> [0,1] NHWC array; defaults to
    `diffusion.sample`. cond_provider(n, np_rng) -> cond pytree or None.
    """
    results_folder = Path(results_folder)
    out_dir = Path(out_dir or results_folder / "sampling")
    out_dir.mkdir(parents=True, exist_ok=True)
    writer = MetricWriter(out_dir / "tensorboard_logs")
    ckpt = CheckpointManager(results_folder)

    params_template = diffusion.init(jax.random.PRNGKey(0))
    template = {
        "step": jnp.zeros((), jnp.int32),
        "ema_params": params_template,
        "ema_step": jnp.zeros((), jnp.int32),
    }

    if sample_fn is None:
        from functools import partial

        @partial(jax.jit, static_argnames=("n",))
        def sample_fn(params, rng, n, cond=None):
            return diffusion.sample(params, rng, n, cond=cond)

    milestones = milestones or ckpt.milestones()
    print(f"found milestones: {milestones}")

    for milestone in milestones:
        restored = ckpt.restore(milestone, template, partial=True)
        ema_params = restored["ema_params"]
        rng = jax.random.PRNGKey(milestone)
        np_rng = np.random.default_rng(milestone)

        # ---- grid
        chunks = []
        for n in num_to_groups(num_samples, batch_size):
            rng, key = jax.random.split(rng)
            cond = cond_provider(n, np_rng) if cond_provider else None
            out = np.asarray(sample_fn(ema_params, key, n, cond))
            if grid_with_cond and cond is not None:
                out = np.concatenate([np.asarray(cond), out], axis=2)
            chunks.append(out)
        grid = np.concatenate(chunks, axis=0)
        save_image_grid(
            grid, out_dir / f"sample-{milestone}.png",
            nrow=int(np.sqrt(num_samples)),
        )
        writer.image("Samples", grid[0], milestone)

        # ---- FID / IS
        if num_fid_samples and (fid_scorer or is_scorer):
            fakes = []
            for n in num_to_groups(num_fid_samples, batch_size):
                rng, key = jax.random.split(rng)
                cond = cond_provider(n, np_rng) if cond_provider else None
                fakes.append(np.asarray(sample_fn(ema_params, key, n, cond)))
            fakes = np.concatenate(fakes, axis=0)
            if fid_scorer is not None:
                fid = fid_scorer.fid_score(fakes)
                print(f"milestone {milestone}: FID {fid:.3f}")
                writer.scalar("Eval/FID", fid, milestone)
            if is_scorer is not None:
                is_mean, _ = is_scorer.calculate_inception_score(fakes)
                print(f"milestone {milestone}: IS {is_mean:.3f}")
                writer.scalar("Eval/IS", is_mean, milestone)

    writer.close()
