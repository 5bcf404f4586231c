"""Numerical-parity tests against torch-implemented oracles.

These re-implement the reference's building-block math in torch (from the
published formulas — no reference code imported) and assert our Flax modules
produce the same numbers on identical weights. This catches subtle semantic
drift: GELU approximation, F.normalize eps, softmax axes of linear
attention, GroupNorm eps, swish, sinusoidal embedding layout.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_rmsnorm_matches_torch_normalize():
    from diffusion_models_tpu.models.unet import RMSNorm

    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 4, 8).astype(np.float32)
    g = rs.rand(8).astype(np.float32)

    out = RMSNorm(8).apply({"params": {"g": jnp.asarray(g)}}, jnp.asarray(x))

    # torch semantics: F.normalize over channel dim * g * sqrt(dim)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    tout = F.normalize(tx, dim=1) * torch.from_numpy(g).view(1, 8, 1, 1) * 8**0.5
    expect = tout.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)


def test_gelu_exact_matches_torch():
    """torch nn.GELU default is the exact erf form — our time MLP must use
    approximate=False."""
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = jax.nn.gelu(jnp.asarray(x), approximate=False)
    theirs = F.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)
    # sanity: the tanh approximation is NOT what torch uses by default
    approx = jax.nn.gelu(jnp.asarray(x), approximate=True)
    assert not np.allclose(np.asarray(approx), theirs, atol=1e-6)


def test_sinusoidal_pos_emb_matches_torch():
    from diffusion_models_tpu.models.unet import SinusoidalPosEmb

    t = np.array([0.0, 17.0, 999.0], np.float32)
    ours = SinusoidalPosEmb(64).apply({}, jnp.asarray(t))

    # torch reference formula (`denoising_diffusion.py:71-84`)
    import math

    half = 32
    emb = math.log(10000) / (half - 1)
    freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    args = torch.from_numpy(t)[:, None] * freqs[None, :]
    expect = torch.cat([args.sin(), args.cos()], dim=-1).numpy()
    # t=999 × freq amplifies f32 ulp differences in exp/arange between libs
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-4, atol=1e-4)


def test_linear_attention_math_matches_torch_einsums():
    from diffusion_models_tpu.ops.attention import linear_attention

    rs = np.random.RandomState(1)
    q = rs.randn(2, 4, 16, 64).astype(np.float32)  # (b, h, d, n)
    k = rs.randn(2, 4, 16, 68).astype(np.float32)
    v = rs.randn(2, 4, 16, 68).astype(np.float32)
    scale = 16**-0.5

    ours = linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale
    )

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    tq = tq.softmax(dim=-2) * scale
    tk = tk.softmax(dim=-1)
    context = torch.einsum("bhdn,bhen->bhde", tk, tv)
    expect = torch.einsum("bhde,bhdn->bhen", context, tq).numpy()
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-4, atol=1e-5)


def test_linear_attention_memkv_decomposition_matches_concat():
    """The analytic memory-KV fold (`linear_attention_bnhd_memkv`, no
    token-axis concat — keeps N tile-aligned on TPU) must equal the concat
    formulation exactly (up to f32 re-association)."""
    from diffusion_models_tpu.ops.attention import (
        linear_attention_bnhd,
        linear_attention_bnhd_memkv,
    )

    rs = np.random.RandomState(7)
    b, n, h, d, m = 2, 32, 4, 16, 4
    q = rs.randn(b, n, h, d).astype(np.float32)
    k = rs.randn(b, n, h, d).astype(np.float32)
    v = rs.randn(b, n, h, d).astype(np.float32)
    mem_k = rs.randn(m, h, d).astype(np.float32)
    mem_v = rs.randn(m, h, d).astype(np.float32)
    scale = d**-0.5

    ours = linear_attention_bnhd_memkv(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mem_k), jnp.asarray(mem_v), scale=scale,
    )

    mk = np.broadcast_to(mem_k, (b, m, h, d))
    k_cat = jnp.asarray(np.concatenate([mk, k], axis=1))
    v_cat = jnp.asarray(np.concatenate([np.broadcast_to(mem_v, (b, m, h, d)), v], axis=1))
    expect = linear_attention_bnhd(jnp.asarray(q), k_cat, v_cat, scale=scale)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(expect), rtol=1e-5, atol=1e-6
    )


def test_linear_attention_folded_matches_per_head():
    """The head-folded formulation (one F×F context matmul + block-diagonal
    mask, 128-wide minor axis everywhere) must equal the per-head
    decomposed path exactly (up to f32 re-association)."""
    from diffusion_models_tpu.ops.attention import (
        linear_attention_bnhd_memkv,
        linear_attention_folded_memkv,
    )

    rs = np.random.RandomState(11)
    b, n, h, d, m = 2, 32, 4, 16, 4
    f = h * d
    q = rs.randn(b, n, f).astype(np.float32)
    k = rs.randn(b, n, f).astype(np.float32)
    v = rs.randn(b, n, f).astype(np.float32)
    mem_k = rs.randn(m, f).astype(np.float32)
    mem_v = rs.randn(m, f).astype(np.float32)
    scale = d**-0.5

    ours = linear_attention_folded_memkv(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mem_k), jnp.asarray(mem_v), heads=h, scale=scale,
    )

    per_head = linear_attention_bnhd_memkv(
        jnp.asarray(q.reshape(b, n, h, d)),
        jnp.asarray(k.reshape(b, n, h, d)),
        jnp.asarray(v.reshape(b, n, h, d)),
        jnp.asarray(mem_k.reshape(m, h, d)),
        jnp.asarray(mem_v.reshape(m, h, d)),
        scale=scale,
    ).reshape(b, n, f)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(per_head), rtol=1e-5, atol=1e-6
    )


def test_full_attention_matches_torch_sdpa():
    from diffusion_models_tpu.ops.attention import dot_product_attention

    rs = np.random.RandomState(2)
    q = rs.randn(2, 4, 32, 16).astype(np.float32)
    k = rs.randn(2, 4, 36, 16).astype(np.float32)
    v = rs.randn(2, 4, 36, 16).astype(np.float32)

    ours = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    expect = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-4, atol=1e-5)


def test_groupnorm_swish_matches_torch():
    from diffusion_models_tpu.models.vae import VAEGroupNorm, swish

    rs = np.random.RandomState(3)
    x = rs.randn(2, 8, 8, 32).astype(np.float32)
    out = VAEGroupNorm().apply(
        {"params": {"GroupNorm_0": {
            "scale": jnp.ones((32,)), "bias": jnp.zeros((32,))}}},
        jnp.asarray(x),
    )
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tout = F.group_norm(tx, 32, eps=1e-6).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), tout, rtol=1e-4, atol=1e-5)

    s = swish(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(s), F.silu(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6
    )


def test_unet_block_matches_torch_composition():
    """Full Block (conv→RMSNorm→FiLM→SiLU) vs a torch composition with the
    SAME weights."""
    from diffusion_models_tpu.models.unet import Block

    rs = np.random.RandomState(4)
    x = rs.randn(1, 8, 8, 4).astype(np.float32)
    w = (rs.randn(3, 3, 4, 6) * 0.1).astype(np.float32)  # HWIO
    b = rs.randn(6).astype(np.float32)
    g = rs.rand(6).astype(np.float32)
    scale = rs.randn(1, 1, 1, 6).astype(np.float32)
    shift = rs.randn(1, 1, 1, 6).astype(np.float32)

    params = {"proj": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
              "norm": {"g": jnp.asarray(g)}}
    out = Block(6).apply(
        {"params": params}, jnp.asarray(x),
        scale_shift=(jnp.asarray(scale), jnp.asarray(shift)),
    )

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    h = F.conv2d(tx, tw, torch.from_numpy(b), padding=1)
    h = F.normalize(h, dim=1) * torch.from_numpy(g).view(1, 6, 1, 1) * 6**0.5
    ts = torch.from_numpy(scale).permute(0, 3, 1, 2)
    tsh = torch.from_numpy(shift).permute(0, 3, 1, 2)
    h = h * (ts + 1) + tsh
    h = F.silu(h)
    expect = h.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)
