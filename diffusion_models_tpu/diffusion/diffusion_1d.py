"""1D diffusion over (B, L, C) sequences.

Capability parity with `denoising_diffusion_1d.py` (`Unet1D:219`,
`DenoisingDiffusion1D:376`, `Trainer1D:681`, `Dataset1D:35`). All the core
samplers/losses are inherited unchanged from `GaussianDiffusion` — the
process math is rank-agnostic in this codebase (the reference instead keeps
a full 2D→1D copy of the file); only the shape contract differs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.training.trainer import Trainer


class Dataset1D:
    """In-memory (N, L, C) sequence dataset (reference `Dataset1D:35`)."""

    def __init__(self, tensor: np.ndarray):
        self.tensor = np.asarray(tensor, np.float32)

    def __len__(self):
        return len(self.tensor)

    def get(self, index: int, rng=None):
        return self.tensor[index]


class GaussianDiffusion1D(GaussianDiffusion):
    def __init__(self, model, *, seq_length: int, **kwargs):
        # reuse the 2D machinery with image_size=(seq_length, 1) bookkeeping
        super().__init__(model, image_size=(seq_length, 1), **kwargs)
        self.seq_length = seq_length

    def sample_shape(self, batch_size: int):
        return (batch_size, self.seq_length, self.channels)

    def loss(self, params, rng, seq, cond=None, *, train: bool = True):
        import jax

        b, l, c = seq.shape
        assert l == self.seq_length, f"sequence length must be {self.seq_length}"
        t_key, loss_key = jax.random.split(rng)
        t = jax.random.randint(t_key, (b,), 0, self.num_timesteps)
        seq = self.normalize(seq)
        return self.p_losses(params, loss_key, seq, t, cond, train=train)


class Trainer1D(Trainer):
    """Trainer over Dataset1D sequences (reference `Trainer1D:681`)."""

    def __init__(self, diffusion_model, dataset: Dataset1D, **kwargs):
        kwargs.setdefault("calculate_fid", False)
        kwargs.setdefault("calculate_is", False)
        super().__init__(diffusion_model, dataset=dataset, **kwargs)

    def _milestone_eval(self, step: int):
        milestone = step // self.save_and_sample_every
        samples = self.generate_samples(self.num_samples, rng_seed=milestone)
        np.save(self.results_folder / f"sample-{milestone}.npy", samples)
        self.save(milestone)
