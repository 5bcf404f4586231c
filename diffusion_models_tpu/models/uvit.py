"""U-ViT backbone for simple diffusion (Hoogeboom et al. 2023).

Capability parity with the reference `UViT` (`simple_diffusion.py:296-466`):
conv ResNet down path → token-space Transformer bottleneck (cosine-sim-style
attention with learned q/k scales, time-conditioned FeedForward FiLM) →
conv up path with skip concats; optional patchify (incl. dual patchnorm) and
flexible per-stage downsample factors.

TPU notes: NHWC; the bottleneck reshape (B,h,w,C)→(B,h·w,C) is free; the
Transformer runs in bf16 with f32 softmax/norms. attention q/k are
l2-normalized then scaled (scale=8) exactly as the reference (:198-223).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.models.unet import (
    RandomOrLearnedSinusoidalPosEmb,
    RMSNorm,
)
from diffusion_models_tpu.utils.helpers import cast_tuple, default, exists


def l2norm(t, eps=1e-12):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), eps)


class UViTBlock(nn.Module):
    """conv → RMSNorm → FiLM → SiLU (no dropout variant, reference :106-122)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        x = RMSNorm(self.dim_out, dtype=self.dtype, name="norm")(x)
        if exists(scale_shift):
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class UViTResnetBlock(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if exists(time_emb):
            t = nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name="time_proj")(t)
            scale_shift = jnp.split(t[:, None, None, :], 2, axis=-1)
        h = UViTBlock(self.dim_out, dtype=self.dtype, name="block1")(
            x, scale_shift
        )
        h = UViTBlock(self.dim_out, dtype=self.dtype, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_conv")(x)
        return h + x


class UViTLinearAttention(nn.Module):
    """Linear attention with internal residual (reference :150-186)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffusion_models_tpu.ops.attention import linear_attention_bnhd

        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        residual = x
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(
            x.reshape(b, n, c)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # token-major (B, N, H, D): head split is a free reshape (no layout
        # copies of the big tensors — see linear_attention_bnhd)
        to_nhd = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        out = linear_attention_bnhd(*(to_nhd(t) for t in (q, k, v)),
                                    scale=self.dim_head**-0.5)
        out = out.reshape(b, h, w, hidden)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_out")(out)
        out = RMSNorm(self.dim, dtype=self.dtype, name="out_norm")(out)
        return out + residual


class UViTAttention(nn.Module):
    """Cosine-sim attention: l2norm(q)/l2norm(k) with learned per-dim scales
    and fixed logit scale (reference :188-223)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    scale: float = 8.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda t: t.reshape(b, n, self.heads, self.dim_head).transpose(
            0, 2, 1, 3
        )
        q, k, v = (to_heads(t) for t in (q, k, v))

        q_scale = self.param("q_scale", nn.initializers.ones,
                             (self.dim_head,), jnp.float32)
        k_scale = self.param("k_scale", nn.initializers.ones,
                             (self.dim_head,), jnp.float32)
        q = l2norm(q.astype(jnp.float32)) * q_scale
        k = l2norm(k.astype(jnp.float32)) * k_scale

        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * self.scale
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, hidden)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class UViTFeedForward(nn.Module):
    """Time-FiLM'd FF with zero-init scale-shift (reference :225-265)."""

    dim: int
    cond_dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        dim_hidden = self.dim * self.mult
        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(dim_hidden, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_in")(x)
        x = nn.silu(x)

        ss = nn.silu(t)
        ss = nn.Dense(dim_hidden * 2, dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="to_scale_shift")(ss)
        scale, shift = jnp.split(ss[:, None, :], 2, axis=-1)
        x = x * (scale + 1) + shift

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj_out")(x)


class UViTTransformer(nn.Module):
    dim: int
    time_cond_dim: int
    depth: int
    dim_head: int = 32
    heads: int = 4
    ff_mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        for i in range(self.depth):
            x = UViTAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, dtype=self.dtype, name=f"attn_{i}",
            )(x, train=train) + x
            x = UViTFeedForward(
                self.dim, self.time_cond_dim, mult=self.ff_mult,
                dropout=self.dropout, dtype=self.dtype, name=f"ff_{i}",
            )(x, t, train=train) + x
        return x


class UViT(nn.Module):
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    downsample_factor: int | Tuple[int, ...] = 2
    channels: int = 3
    vit_depth: int = 6
    vit_dropout: float = 0.2
    attn_dim_head: int = 32
    attn_heads: int = 4
    ff_mult: int = 4
    learned_sinusoidal_dim: int = 16
    patch_size: int = 1
    dual_patchnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, x_self_cond=None, cond=None, *, train: bool = False):
        del x_self_cond, cond
        init_dim = default(self.init_dim, self.dim)
        time_dim = self.dim * 4
        input_channels = self.channels * self.patch_size**2

        # ---- init conv / patchify
        if self.patch_size > 1:
            p = self.patch_size
            if self.dual_patchnorm:
                b, h, w, c = x.shape
                x = x.reshape(b, h // p, p, w // p, p, c).transpose(
                    0, 1, 3, 5, 2, 4
                ).reshape(b, h // p, w // p, c * p * p)
                x = nn.LayerNorm(name="patch_norm1")(x.astype(jnp.float32))
                x = nn.Dense(init_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="patch_dense")(
                    x.astype(self.dtype)
                )
                x = nn.LayerNorm(name="patch_norm2")(
                    x.astype(jnp.float32)
                ).astype(self.dtype)
            else:
                x = nn.Conv(init_dim, (p, p), strides=(p, p), padding="VALID",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="init_conv")(x.astype(self.dtype))
        else:
            x = nn.Conv(init_dim, (7, 7), dtype=self.dtype,
                        param_dtype=jnp.float32, name="init_conv")(
                x.astype(self.dtype)
            )
        r = x

        # ---- time embedding (learned sinusoidal, reference :85-103)
        emb = RandomOrLearnedSinusoidalPosEmb(
            self.learned_sinusoidal_dim, is_random=False, name="sinu_pos_emb"
        )(time)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_dense1")(emb.astype(self.dtype))
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_dense2")(t)

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        factors = cast_tuple(self.downsample_factor, len(self.dim_mults))
        assert len(factors) == len(self.dim_mults)

        resnet = partial(UViTResnetBlock, dtype=self.dtype)

        hs = []
        for ind, ((dim_in, dim_out), factor) in enumerate(zip(in_out, factors)):
            x = resnet(dim_in, name=f"down_{ind}_block1")(x, t)
            hs.append(x)
            x = resnet(dim_in, name=f"down_{ind}_block2")(x, t)
            x = UViTLinearAttention(dim_in, dtype=self.dtype,
                                    name=f"down_{ind}_attn")(x)
            hs.append(x)
            # space-to-depth downsample by `factor` + 1×1 conv
            b, hh, ww, cc = x.shape
            x = x.reshape(b, hh // factor, factor, ww // factor, factor, cc)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
                b, hh // factor, ww // factor, cc * factor * factor
            )
            x = nn.Conv(dim_out, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"down_{ind}_down")(x)

        # ---- ViT bottleneck over flattened tokens
        b, hh, ww, cc = x.shape
        tokens = x.reshape(b, hh * ww, cc)
        tokens = UViTTransformer(
            cc, time_dim, self.vit_depth, dim_head=self.attn_dim_head,
            heads=self.attn_heads, ff_mult=self.ff_mult,
            dropout=self.vit_dropout, dtype=self.dtype, name="vit",
        )(tokens, t, train=train)
        x = tokens.reshape(b, hh, ww, cc)

        for ind, ((dim_in, dim_out), factor) in enumerate(
            zip(reversed(in_out), reversed(factors))
        ):
            # depth-to-space upsample: 1×1 conv to dim_in·f² then pixel-shuffle
            b, hh, ww, cc = x.shape
            x = nn.Conv(dim_in * factor * factor, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"up_{ind}_up")(x)
            x = x.reshape(b, hh, ww, dim_in, factor, factor)
            x = x.transpose(0, 1, 4, 2, 5, 3).reshape(
                b, hh * factor, ww * factor, dim_in
            )

            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_in, name=f"up_{ind}_block1")(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_in, name=f"up_{ind}_block2")(x, t)
            x = UViTLinearAttention(dim_in, dtype=self.dtype,
                                    name=f"up_{ind}_attn")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = resnet(init_dim, name="final_res_block")(x, t)
        out_dim = default(self.out_dim, input_channels)
        x = nn.Conv(out_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="final_conv")(x)

        if self.patch_size > 1:
            # unpatchify via transposed conv (reference :358)
            x = nn.ConvTranspose(
                self.channels, (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                dtype=self.dtype, param_dtype=jnp.float32, name="unpatchify",
            )(x)
        return x.astype(jnp.float32)
