"""Image-conditional diffusion process.

Capability parity with `ImageConditionalDenoisingDiffusion`
(`denoising_diffusion_image_conditional.py:62-326`). The reference copies
every sampler to thread `cond` through; here the base `GaussianDiffusion`
already passes a generic `cond` pytree into the model, so this subclass only
adds the sampling-time condition source.

TPU design note (SURVEY.md §7 hard parts): the reference draws random
condition images from disk *inside* its sampling loops
(`...image_conditional.py:123-153,163`). Here conditions are drawn on host
ONCE per sample call and the whole reverse chain stays a single `lax.scan`
with the condition as a loop-invariant input — behaviorally equivalent,
structurally hoisted.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.utils.data import resize_and_center_crop


class ImageConditionalGaussianDiffusion(GaussianDiffusion):
    def __init__(self, *args, condition_data_folder=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.condition_data_folder = condition_data_folder

    def get_random_condition(self, batch: int, rng: np.random.Generator):
        """Draw `batch` random condition images from the condition folder as
        [0,1] NHWC (host-side; hoisted out of the scan). Conditioning images
        are fed to the model unnormalized, exactly as in the reference
        (dataset ToTensor output, `...image_conditional.py:130-149,363-367`)."""
        from PIL import Image

        folder = Path(self.condition_data_folder)
        paths = sorted(folder.glob("*.*"))
        assert paths, f"no condition images under {folder}"
        idxs = rng.integers(len(paths), size=batch)
        imgs = []
        for i in idxs:
            img = Image.open(paths[int(i)]).convert("RGB")
            img = resize_and_center_crop(img, self.image_size)
            imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
        return np.stack(imgs)

    def sample(
        self,
        params,
        rng,
        batch_size: int = 16,
        cond=None,
        return_all_timesteps: bool = False,
        return_condition_image: bool = False,
        cond_rng: np.random.Generator | None = None,
    ):
        if cond is None:
            cond_rng = cond_rng or np.random.default_rng(
                int(jax.random.randint(rng, (), 0, 2**31 - 1))
            )
            cond = self.get_random_condition(batch_size, cond_rng)
        out = super().sample(
            params, rng, batch_size, cond=cond,
            return_all_timesteps=return_all_timesteps,
        )
        if return_condition_image:
            return cond, out
        return out
