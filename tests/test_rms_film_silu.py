"""Tests for the fused RMSNorm→FiLM→SiLU(→residual) Pallas epilogue
(`ops/pallas/rms_film_silu.py`).

The kernel logic itself is covered in Pallas interpret mode (tests run on
the CPU mesh); the public `rms_film_silu` entry falls back to the plain-jnp
twin off-TPU, so model-level parity is covered by the existing torch-oracle
and golden tests, which exercise RMSNorm/Block through the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_tpu.ops.pallas.rms_film_silu import (
    _reference_impl,
    _rms_film_silu_fwd_pallas,
    rms_film_silu,
)


@pytest.mark.parametrize(
    "shape,film,res,silu",
    [
        ((4, 8, 8, 64), True, False, True),
        ((4, 8, 8, 64), False, True, False),
        ((2, 4, 4, 96), True, True, True),
        ((3, 5, 7, 32), False, False, False),  # odd batch -> bt=1
        ((1, 16, 16, 128), True, True, True),
    ],
)
def test_kernel_matches_reference_interpret(shape, film, res, silu):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, c)), jnp.float32) if film else None
    sh = jnp.asarray(rng.standard_normal((b, c)), jnp.float32) if film else None
    r = jnp.asarray(rng.standard_normal(shape), jnp.float32) if res else None

    got = _rms_film_silu_fwd_pallas(x, g, s, sh, r, silu, interpret=True)
    want = _reference_impl(x, g, s, sh, r, silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_bf16_kernel_interpret():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.bfloat16)
    got = _rms_film_silu_fwd_pallas(x, g, None, None, r, True, interpret=True)
    want = _reference_impl(x, g, None, None, r, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2
    )


def test_matches_unfused_rmsnorm_math():
    """The public entry (CPU fallback) reproduces the original unfused
    RMSNorm formula (`models/unet.py::RMSNorm`) bit-for-bit."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
    )
    want = x * inv * (g * 32**0.5)
    got = rms_film_silu(x, g, silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_pallas_route_custom_vjp_matches_autodiff(monkeypatch):
    """The opt-in Pallas route's custom_vjp (DMT_PALLAS_NORM=1) produces the
    same grads as XLA autodiff of the plain expression. The DEFAULT route
    deliberately bypasses custom_vjp entirely — a custom_vjp boundary at
    every norm site measured ~8× slower training (see module docstring)."""
    import diffusion_models_tpu.ops.pallas.rms_film_silu as mod

    monkeypatch.setattr(mod, "_PALLAS_NORM", True)
    rng = np.random.default_rng(4)
    b, h, w, c = 2, 4, 4, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    def fused(*a):
        return jnp.sum(mod.rms_film_silu(*a, silu=True) ** 2)

    def plain(*a):
        return jnp.sum(_reference_impl(*a, silu=True) ** 2)

    got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, g, s, sh, r)
    want = jax.grad(plain, argnums=(0, 1, 2, 3, 4))(x, g, s, sh, r)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5,
                                   atol=1e-5)


def test_custom_vjp_matches_autodiff():
    """Grads through the fused op == grads through the plain formula, for
    every input (x, gain, FiLM scale/shift, residual)."""
    rng = np.random.default_rng(3)
    b, h, w, c = 2, 4, 4, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    def fused(x, g, s, sh, r):
        return jnp.sum(rms_film_silu(x, g, s, sh, r, silu=True) ** 2)

    def manual(x, g, s, sh, r):
        inv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
        )
        out = x * inv * (g * c**0.5)
        out = out * (s[:, None, None, :] + 1.0) + sh[:, None, None, :]
        out = out * jax.nn.sigmoid(out) + r
        return jnp.sum(out**2)

    got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, g, s, sh, r)
    want = jax.grad(manual, argnums=(0, 1, 2, 3, 4))(x, g, s, sh, r)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5,
                                   atol=1e-5)
