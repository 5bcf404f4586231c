"""Encoder-propagation fast sampling (Faster Diffusion, arXiv:2312.09608).

Contract: at a key step the U-Net returns its down-path activations; a
non-key call with that cache and the SAME (x, t) must reproduce the plain
forward exactly (the approximation comes only from reusing the cache at
*later* timesteps, never from the mechanism itself).
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet


def _tiny():
    unet = Unet(dim=8, dim_mults=(1, 2), channels=3, dtype=jnp.float32)
    diff = GaussianDiffusion(
        unet, image_size=16, timesteps=20, sampling_timesteps=4,
        beta_schedule="cosine",
    )
    params = diff.init(jax.random.PRNGKey(0))
    return unet, diff, params


def test_unet_cache_reuse_is_exact_at_same_input():
    unet, diff, params = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([3, 9], jnp.int32)

    plain = unet.apply({"params": params}, x, t)
    out_key, cache = unet.apply(
        {"params": params}, x, t, return_enc_cache=True
    )
    out_cached = unet.apply({"params": params}, x, t, enc_cache=cache)

    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out_key))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out_cached))
    # cache structure: one skip per resblock/attn push + bottleneck input
    skips, bottom = cache
    assert len(skips) == 2 * 2  # 2 stages x 2 pushes
    assert bottom.shape == (2, 8, 8, 16)


def test_single_step_cached_sampler_matches_standard():
    """With S=1 every step is a key step — the cached sampler must be
    bit-identical to the standard DDIM path."""
    _, diff, params = _tiny()
    rng = jax.random.PRNGKey(7)
    a = diff.ddim_sample(params, rng, (2, 16, 16, 3), sampling_timesteps=1)
    b = diff.ddim_sample(
        params, rng, (2, 16, 16, 3), sampling_timesteps=1,
        encoder_cache_interval=2,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cached_sampler_interval2_runs_and_is_sane():
    _, diff, params = _tiny()
    out = diff.ddim_sample(
        params, jax.random.PRNGKey(3), (2, 16, 16, 3),
        sampling_timesteps=4, encoder_cache_interval=2,
    )
    arr = np.asarray(out)
    assert arr.shape == (2, 16, 16, 3)
    assert np.isfinite(arr).all()
    assert arr.min() >= -0.01 and arr.max() <= 1.01
