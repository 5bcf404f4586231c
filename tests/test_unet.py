"""Shape/dtype tests for the U-Net and its building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_tpu.models.unet import (
    Attention,
    LinearAttention,
    ResnetBlock,
    RMSNorm,
    SinusoidalPosEmb,
    Unet,
)


def test_rmsnorm_matches_oracle():
    x = np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32)
    mod = RMSNorm(8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    # unit g: x l2-normalized over channels * sqrt(dim)
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    expect = x / np.maximum(norm, 1e-12) * np.sqrt(8)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)


def test_sinusoidal_pos_emb():
    emb = SinusoidalPosEmb(64)
    out = emb.apply({}, jnp.array([0.0, 1.0, 999.0]))
    assert out.shape == (3, 64)
    # t=0: sin part 0, cos part 1
    np.testing.assert_allclose(np.asarray(out[0, :32]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 32:]), 1.0, atol=1e-6)


def test_resnet_block_shapes():
    mod = ResnetBlock(32)
    x = jnp.zeros((2, 8, 8, 16))
    t = jnp.zeros((2, 64))
    params = mod.init({"params": jax.random.PRNGKey(0)}, x, t)
    out = mod.apply(params, x, t)
    assert out.shape == (2, 8, 8, 32)


@pytest.mark.parametrize("cls", [Attention, LinearAttention])
def test_attention_shapes(cls):
    mod = cls(32, heads=4, dim_head=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_forward_shapes():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 5], jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == jnp.float32


def test_unet_learned_variance_doubles_channels():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3, learned_variance=True)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (1, 16, 16, 6)


def test_unet_self_condition():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3, self_condition=True)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    out_none = model.apply({"params": params}, x, t, None)
    out_sc = model.apply({"params": params}, x, t, jnp.ones_like(x))
    assert out_none.shape == (1, 16, 16, 3)
    assert not np.allclose(np.asarray(out_none), np.asarray(out_sc))


def test_unet_bf16_compute():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    # params stay f32 masters
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = model.apply({"params": params}, x, t)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_dropout_needs_rng_and_is_stochastic():
    model = Unet(dim=16, dim_mults=(1, 2), channels=3, dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, t
    )["params"]
    o1 = model.apply(
        {"params": params}, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    o2 = model.apply(
        {"params": params}, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(4)}
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # eval mode is deterministic
    e1 = model.apply({"params": params}, x, t)
    e2 = model.apply({"params": params}, x, t)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
