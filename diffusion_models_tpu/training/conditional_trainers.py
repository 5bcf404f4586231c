"""Conditional trainers: image- and text-conditioned variants.

Capability parity with `ImageConditionalTrainer`
(`denoising_diffusion_image_conditional.py:329-445`) and
`TextConditionalTrainer` (`denoising_diffusion_text_conditional.py:558-667`).

The reference copies the whole training loop per conditional variant; here
the base `Trainer` step is generic over a `cond` pytree, so the subclasses
only override the three data hooks:
  - `build_dataset` — paired / text dataset instead of a flat folder,
  - `batch_to_args` — unpack `(target, cond)` batches,
  - `sample_cond`   — sampling-time condition draws (random cond images /
    random captions), which in the TPU design are hoisted out of the scan.

Sample grids match the reference layout: image-conditional grids concat
cond ‖ sample along width (`...image_conditional.py:394`); text-conditional
runs save the drawn captions to `sample-<milestone>.txt`
(`..._text_conditional.py:617`).
"""

from __future__ import annotations

import numpy as np
import jax

from diffusion_models_tpu.training.trainer import Trainer
from diffusion_models_tpu.utils.data import (
    ClassConditionalDataset,
    ImageConditionalDataset,
    TextConditionalDataset,
)
from diffusion_models_tpu.utils.helpers import num_to_groups
from diffusion_models_tpu.utils.image import save_image_grid


class ImageConditionalTrainer(Trainer):
    """Trainer over (target, cond-image) pairs."""

    def build_dataset(self, folder, *, augment_horizontal_flip, convert_image_to):
        return ImageConditionalDataset(
            folder,
            self.data_image_size,
            augment_horizontal_flip=augment_horizontal_flip,
            convert_image_to=convert_image_to,
        )

    def batch_to_args(self, batch):
        target, cond = batch
        return target, cond

    def sample_cond(self, n: int, rng: np.random.Generator):
        idxs = rng.integers(len(self.dataset), size=n)
        conds = [self.dataset.get(int(i))[1] for i in idxs]
        return np.stack(conds)

    def _milestone_eval(self, step: int):
        milestone = step // self.save_and_sample_every
        # cond ‖ sample side-by-side grid
        rng = jax.random.PRNGKey(milestone)
        np_rng = np.random.default_rng(milestone)
        chunks = []
        for n in num_to_groups(self.num_samples, self.batch_size):
            rng, key = jax.random.split(rng)
            cond = self.sample_cond(n, np_rng)
            out = self._fetch(self._jit_sample(self.state.ema.params, key, n, cond))
            chunks.append(np.concatenate([cond, out], axis=2))  # along width
        grid = np.concatenate(chunks, axis=0)
        if jax.process_index() == 0:
            save_image_grid(
                grid,
                self.results_folder / f"sample-{milestone}.png",
                nrow=int(np.sqrt(self.num_samples)),
            )
        self.writer.image("Samples", grid[0], step)

        self._conditional_eval_and_save(step, milestone)

    def _conditional_eval_and_save(self, step, milestone):
        fid = None
        if (self.calculate_fid and self._fid_scorer is not None) or (
            self.calculate_is and self._is_scorer is not None
        ):
            fakes = self.generate_samples(
                self.num_fid_samples, rng_seed=10_000 + milestone
            )
            if self.calculate_fid and self._fid_scorer is not None:
                fid = self._fid_scorer.fid_score(fakes)
                self.writer.scalar("Eval/FID", fid, step)
            if self.calculate_is and self._is_scorer is not None:
                is_mean, _ = self._is_scorer.calculate_inception_score(fakes, step)
                self.writer.scalar("Eval/IS", is_mean, step)

        if self.save_best_and_latest_only:
            if fid is not None and fid < self.best_fid:
                self.best_fid = fid
                self.save("best")
            self.save("latest")
        else:
            self.save(milestone)


class CFGTrainer(Trainer):
    """Trainer over (image, class-label) pairs for classifier-free guidance
    (reference `classifier_free_guidance.py` defines the model/diffusion but
    no trainer — training reuses the generic loop with class conds)."""

    def build_dataset(self, folder, *, augment_horizontal_flip, convert_image_to):
        return ClassConditionalDataset(
            folder,
            self.data_image_size,
            augment_horizontal_flip=augment_horizontal_flip,
            convert_image_to=convert_image_to,
        )

    def batch_to_args(self, batch):
        img, classes = batch
        return img, classes

    def sample_cond(self, n: int, rng: np.random.Generator):
        return rng.integers(self.dataset.num_classes, size=n).astype(np.int32)

    def _milestone_eval(self, step: int):
        milestone = step // self.save_and_sample_every
        # grid conditioned on a deterministic class cycle (row ≈ class)
        rng = jax.random.PRNGKey(milestone)
        n = self.num_samples
        classes = (np.arange(n) % self.dataset.num_classes).astype(np.int32)
        chunks = []
        for i, sz in enumerate(num_to_groups(n, self.batch_size)):
            rng, key = jax.random.split(rng)
            block = np.zeros((self.batch_size,), np.int32)
            sel = classes[i * self.batch_size : i * self.batch_size + sz]
            block[: len(sel)] = sel
            out = self._jit_sample(
                self.state.ema.params, key, self.batch_size, block
            )
            chunks.append(self._fetch(out, sz))
        grid = np.concatenate(chunks, axis=0)
        if jax.process_index() == 0:
            save_image_grid(
                grid,
                self.results_folder / f"sample-{milestone}.png",
                nrow=int(np.sqrt(self.num_samples)),
            )
            with open(self.results_folder / f"sample-{milestone}.txt", "w") as f:
                f.write(
                    "\n".join(self.dataset.class_names[c] for c in classes)
                )
        self.writer.image("Samples", grid[0], step)

        ImageConditionalTrainer._conditional_eval_and_save(self, step, milestone)


class TextConditionalTrainer(Trainer):
    """Trainer over (target, clip-text-embedding) pairs."""

    def __init__(self, *args, embedding_file=None, **kwargs):
        self._embedding_file = embedding_file
        super().__init__(*args, **kwargs)

    def build_dataset(self, folder, *, augment_horizontal_flip, convert_image_to):
        return TextConditionalDataset(
            folder,
            self.data_image_size,
            augment_horizontal_flip=augment_horizontal_flip,
            convert_image_to=convert_image_to,
            embedding_file=self._embedding_file,
        )

    def batch_to_args(self, batch):
        target, text_emb = batch
        return target, text_emb

    def sample_cond(self, n: int, rng: np.random.Generator):
        _, embs = self.dataset.random_embeddings(n, rng)
        return embs

    def _milestone_eval(self, step: int):
        milestone = step // self.save_and_sample_every
        rng = jax.random.PRNGKey(milestone)
        np_rng = np.random.default_rng(milestone)
        chunks, captions = [], []
        for n in num_to_groups(self.num_samples, self.batch_size):
            rng, key = jax.random.split(rng)
            caps, embs = self.dataset.random_embeddings(n, np_rng)
            out = self._fetch(self._jit_sample(self.state.ema.params, key, n, embs))
            chunks.append(out)
            captions.extend(caps)
        grid = np.concatenate(chunks, axis=0)
        if jax.process_index() == 0:
            save_image_grid(
                grid,
                self.results_folder / f"sample-{milestone}.png",
                nrow=int(np.sqrt(self.num_samples)),
            )
            with open(self.results_folder / f"sample-{milestone}.txt", "w") as f:
                f.write("\n".join(captions))
        self.writer.image("Samples", grid[0], step)
        # caption tiles alongside the grid (reference `log_txt_as_img`)
        from diffusion_models_tpu.utils.image import log_txt_as_img

        caption_tiles = log_txt_as_img(grid.shape[1:3][::-1], captions[:1])
        self.writer.image("Captions", caption_tiles[0], step)
        self.writer.text("Captions/text", "; ".join(captions), step)

        ImageConditionalTrainer._conditional_eval_and_save(self, step, milestone)
