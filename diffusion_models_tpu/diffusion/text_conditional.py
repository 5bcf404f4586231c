"""Text-conditional diffusion process.

Capability parity with `TextConditionalDenoisingDiffusion`
(`denoising_diffusion_text_conditional.py:264-556`): samples conditioned on
CLIP text embeddings; at generation time random captions are drawn from the
precomputed embeddings pickle and returned alongside images so the trainer
can save `sample-<milestone>.txt` caption files
(`..._text_conditional.py:320-380,617`).

TPU design: caption/embedding draws happen on host ONCE per sample call; the
embedding rides the `lax.scan` as a loop-invariant — the reference instead
touches the pickle inside its host-driven loop.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion


class TextConditionalGaussianDiffusion(GaussianDiffusion):
    def __init__(self, *args, embeddings_file=None, text_emb_dim: int = 512, **kwargs):
        super().__init__(*args, **kwargs)
        self.text_emb_dim = text_emb_dim
        self.embeddings_file = embeddings_file
        self._embeddings_dict = None

    def example_cond(self, batch_size: int):
        return jnp.zeros((batch_size, self.text_emb_dim), jnp.float32)

    @property
    def embeddings_dict(self):
        if self._embeddings_dict is None:
            assert self.embeddings_file is not None, (
                "set embeddings_file (a pickle of {stem: {captions, "
                "embeddings}}) to draw random text conditions"
            )
            with open(self.embeddings_file, "rb") as f:
                self._embeddings_dict = pickle.load(f)
        return self._embeddings_dict

    def get_random_text(self, batch: int, rng: np.random.Generator):
        """(captions, embeddings (B, D)) drawn uniformly from the pickle."""
        stems = list(self.embeddings_dict.keys())
        captions, embs = [], []
        for _ in range(batch):
            d = self.embeddings_dict[stems[int(rng.integers(len(stems)))]]
            j = int(rng.integers(len(d["captions"])))
            captions.append(d["captions"][j])
            embs.append(np.asarray(d["embeddings"][j], np.float32))
        return captions, np.stack(embs)

    def sample(
        self,
        params,
        rng,
        batch_size: int = 16,
        cond=None,
        return_all_timesteps: bool = False,
        return_captions: bool = False,
        cond_rng: np.random.Generator | None = None,
    ):
        captions = None
        if cond is None:
            cond_rng = cond_rng or np.random.default_rng(
                int(jax.random.randint(rng, (), 0, 2**31 - 1))
            )
            captions, cond = self.get_random_text(batch_size, cond_rng)
        out = super().sample(
            params, rng, batch_size, cond=cond,
            return_all_timesteps=return_all_timesteps,
        )
        if return_captions:
            return out, captions
        return out
