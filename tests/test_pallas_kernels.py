"""Pallas kernel correctness tests (interpret mode on CPU)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from diffusion_models_tpu.ops.attention import dot_product_attention


def test_flash_attention_matches_reference():
    from diffusion_models_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 2, 256, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 260, 32))  # +mem kv
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 260, 32))

    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_small_falls_back():
    from diffusion_models_tpu.ops.pallas.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 68, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 68, 32))
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_unaligned_lengths():
    from diffusion_models_tpu.ops.pallas.flash_attention import flash_attention

    # N not a multiple of 128, M not a multiple of 128
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 200, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 137, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 137, 32))
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_ddim_step_matches_formula():
    from diffusion_models_tpu.ops.pallas.ddim_step import fused_ddim_step

    rs = jax.random.PRNGKey(0)
    x = jax.random.normal(rs, (2, 16, 16, 3))
    eps = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    a, b, an, c, sigma = 1.2, 0.7, 0.9, 0.4, 0.05
    coefs = jnp.array([a, b, an, c, sigma], jnp.float32)

    out = fused_ddim_step(x, eps, noise, coefs, interpret=True)

    x0 = np.clip(a * np.asarray(x) - b * np.asarray(eps), -1, 1)
    eps_re = (a * np.asarray(x) - x0) / b
    expect = x0 * an + c * eps_re + sigma * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_fused_linear_attention_matches_reference():
    from diffusion_models_tpu.ops.attention import linear_attention
    from diffusion_models_tpu.ops.pallas.linear_attention import (
        fused_linear_attention,
    )

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 200))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 204))  # +mem kv
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32, 204))

    ref = linear_attention(q, k, v, scale=32**-0.5)
    out = fused_linear_attention(q, k, v, scale=32**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_q_sample_matches_formula():
    from diffusion_models_tpu.ops.pallas.q_sample import fused_q_sample

    x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 16, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    a = jnp.array([0.9, 0.5, 0.1])
    b = jnp.array([0.436, 0.866, 0.995])
    out = fused_q_sample(x0, noise, a, b, interpret=True)
    expect = (
        np.asarray(a)[:, None, None, None] * np.asarray(x0)
        + np.asarray(b)[:, None, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_fused_mse_per_sample():
    from diffusion_models_tpu.ops.pallas.q_sample import fused_mse_per_sample

    a = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), a.shape)
    out = fused_mse_per_sample(a, b, interpret=True)
    expect = np.mean(
        (np.asarray(a) - np.asarray(b)) ** 2, axis=(1, 2, 3)
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


@pytest.mark.slow
def test_use_pallas_wired_paths_match_xla():
    """The `use_pallas=True` production wiring (q_sample + per-sample MSE in
    p_losses, fused DDIM update in ddim_sample) must match the XLA path
    bit-for-bit-ish. Runs in interpret mode on the CPU mesh; validated on
    real TPU hardware too (docs/ROUND2_NOTES.md)."""
    from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
    from diffusion_models_tpu.models.unet import Unet

    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    mk = lambda up: GaussianDiffusion(
        model, image_size=16, timesteps=50, sampling_timesteps=3,
        beta_schedule="cosine", use_pallas=up,
    )
    ref, pal = mk(False), mk(True)
    params = ref.init(jax.random.PRNGKey(0))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))

    l0 = jax.jit(lambda p, r, b: ref.loss(p, r, b, train=False))(
        params, jax.random.PRNGKey(2), batch
    )
    l1 = jax.jit(lambda p, r, b: pal.loss(p, r, b, train=False))(
        params, jax.random.PRNGKey(2), batch
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)

    # gradient parity through the custom-VJP MSE kernel
    g0 = jax.grad(lambda p: ref.loss(p, jax.random.PRNGKey(2), batch, train=False))(params)
    g1 = jax.grad(lambda p: pal.loss(p, jax.random.PRNGKey(2), batch, train=False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    s0 = jax.jit(lambda p, r: ref.ddim_sample(p, r, (2, 16, 16, 3)))(
        params, jax.random.PRNGKey(3)
    )
    s1 = jax.jit(lambda p, r: pal.ddim_sample(p, r, (2, 16, 16, 3)))(
        params, jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)
