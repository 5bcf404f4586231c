"""1D denoising U-Net over (B, L, C) sequences.

Capability parity with the reference `Unet1D`
(`denoising_diffusion_1d.py:219-374`) — the same 4-stage encoder/decoder
shape as the 2D net with 1D convolutions, RMSNorm, FiLM time conditioning,
linear attention at outer stages and full attention at the bottleneck.

Layout: channels-last (B, L, C) — the TPU-friendly layout where every conv
is a (L, C)×(K·C, C') matmul.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.models.unet import (
    RMSNorm,
    SinusoidalPosEmb,
    RandomOrLearnedSinusoidalPosEmb,
)
from diffusion_models_tpu.ops.attention import (
    dot_product_attention,
    linear_attention_bnhd,
)
from diffusion_models_tpu.utils.helpers import cast_tuple, default, divisible_by, exists


class Block1D(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, *, train: bool = False):
        x = nn.Conv(self.dim_out, (3,), dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj")(x)
        x = RMSNorm(self.dim_out, dtype=self.dtype, name="norm")(x)
        if exists(scale_shift):
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = nn.silu(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ResnetBlock1D(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, *, train: bool = False):
        scale_shift = None
        if exists(time_emb):
            t = nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name="time_proj")(t)
            t = t[:, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)
        h = Block1D(self.dim_out, dropout=self.dropout, dtype=self.dtype,
                    name="block1")(x, scale_shift=scale_shift, train=train)
        h = Block1D(self.dim_out, dtype=self.dtype, name="block2")(h, train=train)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1,), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_conv")(x)
        return h + x


class Attention1D(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda t: t.reshape(b, n, self.heads, self.dim_head).transpose(
            0, 2, 1, 3
        )
        out = dot_product_attention(*(to_heads(t) for t in (q, k, v)))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, hidden)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class LinearAttention1D(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # token-major (B, N, H, D): head split is a free reshape (no layout
        # copies of the big tensors — see linear_attention_bnhd)
        to_nhd = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        out = linear_attention_bnhd(*(to_nhd(t) for t in (q, k, v)),
                                    scale=self.dim_head**-0.5)
        out = out.reshape(b, n, hidden)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_out")(out)
        return RMSNorm(self.dim, dtype=self.dtype, name="out_norm")(out)


class Unet1D(nn.Module):
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    sinusoidal_pos_emb_theta: float = 10000.0
    dropout: float = 0.0
    attn_dim_head: int = 32
    attn_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_factor(self):
        return 2 ** (len(self.dim_mults) - 1)

    @property
    def default_out_dim(self):
        return self.channels * (2 if self.learned_variance else 1)

    @nn.compact
    def __call__(self, x, time, x_self_cond=None, cond=None, *, train: bool = False):
        del cond
        assert divisible_by(x.shape[1], self.downsample_factor)
        if self.self_condition:
            x_self_cond = default(x_self_cond, lambda: jnp.zeros_like(x))
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = default(self.init_dim, self.dim)
        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4

        x = nn.Conv(init_dim, (7,), dtype=self.dtype, param_dtype=jnp.float32,
                    name="init_conv")(x.astype(self.dtype))
        r = x

        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, is_random=self.random_fourier_features,
                name="sinu_pos_emb")(time)
        else:
            emb = SinusoidalPosEmb(self.dim, theta=self.sinusoidal_pos_emb_theta,
                                   name="sinu_pos_emb")(time)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_dense1")(emb.astype(self.dtype))
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_dense2")(t)

        resnet = partial(ResnetBlock1D, dropout=self.dropout, dtype=self.dtype)
        num_resolutions = len(in_out)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = resnet(dim_in, name=f"down_{ind}_block1")(x, t, train=train)
            hs.append(x)
            x = resnet(dim_in, name=f"down_{ind}_block2")(x, t, train=train)
            x = LinearAttention1D(
                dim_in, heads=self.attn_heads, dim_head=self.attn_dim_head,
                dtype=self.dtype, name=f"down_{ind}_attn")(x) + x
            hs.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (4,), strides=(2,), padding=((1, 1),),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down_{ind}_down")(x)
            else:
                x = nn.Conv(dim_out, (3,), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"down_{ind}_conv")(x)

        mid_dim = dims[-1]
        x = resnet(mid_dim, name="mid_block1")(x, t, train=train)
        x = Attention1D(mid_dim, heads=self.attn_heads,
                        dim_head=self.attn_dim_head, dtype=self.dtype,
                        name="mid_attn")(x) + x
        x = resnet(mid_dim, name="mid_block2")(x, t, train=train)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_resolutions - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_out, name=f"up_{ind}_block1")(x, t, train=train)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_out, name=f"up_{ind}_block2")(x, t, train=train)
            x = LinearAttention1D(
                dim_out, heads=self.attn_heads, dim_head=self.attn_dim_head,
                dtype=self.dtype, name=f"up_{ind}_attn")(x) + x
            if not is_last:
                # nearest 2× upsample + conv
                x = jnp.repeat(x, 2, axis=1)
                x = nn.Conv(dim_in, (3,), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"up_{ind}_up")(x)
            else:
                x = nn.Conv(dim_in, (3,), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"up_{ind}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = resnet(init_dim, name="final_res_block")(x, t, train=train)
        out_dim = default(self.out_dim, self.default_out_dim)
        x = nn.Conv(out_dim, (1,), dtype=self.dtype, param_dtype=jnp.float32,
                    name="final_conv")(x)
        return x.astype(jnp.float32)
