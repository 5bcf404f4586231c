"""The 2D denoising U-Net, designed TPU-first.

Capability parity with the reference `Unet`
(`denoising_diffusion/denoising_diffusion.py:233-390`): 4-stage encoder /
decoder with per-stage [ResBlock, ResBlock, attention, down/upsample], a
ResBlock+full-attention bottleneck, skip concatenation, FiLM-style time
conditioning, and linear attention everywhere except the innermost stage.

TPU-native choices (not a translation of the torch module):
  - NHWC layout throughout — the native layout for TPU convolutions.
  - bf16 activations / f32 parameters (`dtype` / `param_dtype`), so conv and
    attention matmuls run on the MXU at bf16 while norms/softmax accumulate
    in f32.
  - Downsample is a space-to-depth reshape + 1×1 conv (matching the
    reference's pixel-unshuffle at `denoising_diffusion.py:54-57`) — both the
    reshape and the 1×1 conv map directly onto MXU-tileable ops.
  - Attention over flattened H·W tokens with learned "memory" KV slots
    (`denoising_diffusion.py:165,211`).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.ops.attention import (
    dot_product_attention,
    linear_attention_bnhd_memkv,
    linear_attention_folded_memkv,
)
from diffusion_models_tpu.ops.pallas.rms_film_silu import rms_film_silu
from diffusion_models_tpu.utils.helpers import cast_tuple, default, divisible_by, exists


class RMSNorm(nn.Module):
    """Channel-wise RMS norm over the last (channel) axis.

    Matches the reference RMSNorm (`denoising_diffusion.py:60-67`):
    l2-normalize over channels, scale by a learned per-channel gain times
    sqrt(dim). Normalization runs in f32 for bf16 safety.

    4-D inputs take the fused-epilogue entry (`ops/pallas/rms_film_silu.py`)
    so the optional FiLM scale-shift, SiLU, residual add, and final cast
    are one expression XLA schedules as reduce + a single elementwise pass.
    (The Pallas one-pass variant of the same epilogue measured SLOWER than
    XLA's schedule on the flagship model — see the module's measurement
    note — so it is opt-in via DMT_PALLAS_NORM=1.)
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, shift=None, residual=None,
                 silu: bool = False):
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        if x.ndim == 4:
            return rms_film_silu(
                x.astype(self.dtype), g, scale, shift, residual, silu=silu
            )
        assert scale is None and residual is None and not silu
        x32 = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x32 * x32, axis=-1, keepdims=True), 1e-24)
        )
        out = x32 * inv * (g * self.dim**0.5)
        return out.astype(self.dtype)


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal timestep embedding
    (`denoising_diffusion.py:71-84`)."""

    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half_dim, dtype=jnp.float32)
            * -(math.log(self.theta) / (half_dim - 1))
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Random (fixed) or learned Fourier features for continuous time
    (`denoising_diffusion.py:86-101`). Output dim = dim + 1."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        weights = self.param(
            "weights", nn.initializers.normal(stddev=1.0), (half_dim,), jnp.float32
        )
        if self.is_random:
            weights = jax.lax.stop_gradient(weights)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block(nn.Module):
    """conv3x3 → RMSNorm → (FiLM scale-shift) → SiLU → dropout
    (`denoising_diffusion.py:105-122`)."""

    dim_out: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, *, train: bool = False,
                 residual=None):
        """`residual` is fused into the norm epilogue kernel (added after the
        final cast) when dropout is inactive; with active dropout the add
        happens after the dropout mask, matching `h + res` semantics."""
        x = nn.Conv(
            self.dim_out, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
            name="proj",
        )(x)
        scale = shift = None
        if exists(scale_shift):
            scale, shift = scale_shift  # (B, 1, 1, C) each
            scale = scale.reshape(scale.shape[0], scale.shape[-1])
            shift = shift.reshape(shift.shape[0], shift.shape[-1])
        drop_active = train and self.dropout > 0
        x = RMSNorm(self.dim_out, dtype=self.dtype, name="norm")(
            x, scale=scale, shift=shift,
            residual=None if drop_active else residual, silu=True,
        )
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if drop_active and exists(residual):
            x = x + residual
        return x


class ResnetBlock(nn.Module):
    """Two conv blocks with a FiLM time-embedding injection and residual
    (`denoising_diffusion.py:124-148`)."""

    dim_out: int
    time_emb: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, *, train: bool = False):
        scale_shift = None
        if self.time_emb and exists(time_emb):
            t = nn.silu(time_emb)
            t = nn.Dense(
                self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32,
                name="time_proj",
            )(t)
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, dropout=self.dropout, dtype=self.dtype, name="block1")(
            x, scale_shift=scale_shift, train=train
        )
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(
                self.dim_out, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                name="res_conv",
            )(x)
        # residual add rides block2's fused norm epilogue (block2 has no
        # dropout — reference `denoising_diffusion.py:131`)
        return Block(self.dim_out, dtype=self.dtype, name="block2")(
            h, train=train, residual=x
        )


def _qkv_heads(x, heads):
    """(B, N, H*D) → (B, heads, N, D)."""
    b, n, hd = x.shape
    d = hd // heads
    return x.reshape(b, n, heads, d).transpose(0, 2, 1, 3)


class _Gain(nn.Module):
    """Param holder: an RMSNorm gain with the same path (`<name>/g`) the
    RMSNorm module would create — lets LinearAttention route the SAME
    parameters through either the fused Pallas block or the jnp path."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)


class _DenseParams(nn.Module):
    """Param holder matching `nn.Dense(features)` (kernel (in, out), lecun
    normal; optional zero bias)."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


class _Conv1x1Params(nn.Module):
    """Param holder matching `nn.Conv(features, (1, 1))` (kernel
    (1, 1, in, out), lecun normal; zero bias)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class Attention(nn.Module):
    """Full self-attention over H·W spatial tokens with learned memory KV
    slots (`denoising_diffusion.py:195-229`). With `flash=True` the score
    matrix never touches HBM — the Pallas kernel in
    `ops/pallas/flash_attention.py` replaces the reference's torch-SDPA
    dispatch (`attend.py:72-93`)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head

        x = RMSNorm(self.dim, dtype=self.dtype, name="norm")(x)
        tokens = x.reshape(b, h * w, c)

        qkv = nn.Dense(
            hidden * 3, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="to_qkv",
        )(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_qkv_heads(t, self.heads) for t in (q, k, v))

        mem_kv = self.param(
            "mem_kv",
            nn.initializers.normal(stddev=1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head),
            jnp.float32,
        ).astype(self.dtype)
        mk = jnp.broadcast_to(mem_kv[0], (b,) + mem_kv[0].shape)
        mv = jnp.broadcast_to(mem_kv[1], (b,) + mem_kv[1].shape)
        k = jnp.concatenate([mk, k], axis=-2)
        v = jnp.concatenate([mv, v], axis=-2)

        if self.flash:
            from diffusion_models_tpu.ops.pallas.flash_attention import (
                flash_attention,
            )

            out = flash_attention(q, k, v)
        else:
            out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden)
        out = nn.Conv(
            self.dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="to_out"
        )(out)
        # XLA fuses the residual add into the 1×1-conv epilogue
        return out if residual is None else out + residual


class LinearAttention(nn.Module):
    """O(N) linear attention with memory KV and a gated output norm
    (`denoising_diffusion.py:150-193`).

    Data paths (identical parameters and math in all three):
      - `fused_block` (DEFAULT on TPU via `route_for_inference`, which
        clones the Unet with `fused_attn_block=True`): the WHOLE block —
        pre-norm, qkv projection, both softmaxes, contractions, output
        projection, out-norm, residual — as one Pallas kernel
        (`ops/pallas/linear_attn_block.py`, head-folded v2 with analytic
        backward): measured +24% DDIM-50 sampling and +20.6% clean-chip
        train step on v5e (docs/ROUND3_NOTES.md). Under a DP mesh it
        shard_maps over the data axis (`set_fused_mesh`).
        `DMT_PALLAS_LINATTN=0` kills it globally; `=1` forces it on for
        modules whose flag is unset (e.g. outside the diffusion routing).
      - `flash=True`: round-2 per-(b·h) Pallas contraction kernel
        (measured −15% end-to-end; opt-in for other shapes).
      - otherwise (CPU / kill-switch): the jnp path
        (`linear_attention_bnhd_memkv`), token-major with the memory-KV
        slots folded in analytically (no token-axis concat, so k/v stay
        tile-aligned at N = H·W); XLA fuses it — also the reference for
        parity tests.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    flash: bool = False
    fused_block: Optional[bool] = None  # None = auto: on for TPU
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        # raw parameters, shared verbatim by every data path (paths/shapes
        # identical to the previous nn.Dense/nn.Conv/RMSNorm modules, so
        # checkpoints and torch converters are unaffected)
        g1 = _Gain(self.dim, name="norm")()
        wqkv, _ = _DenseParams(c, hidden * 3, use_bias=False, name="to_qkv")()
        mem_kv = self.param(
            "mem_kv",
            nn.initializers.normal(stddev=1.0),
            (2, self.heads, self.dim_head, self.num_mem_kv),
            jnp.float32,
        ).astype(self.dtype)
        wout, bout = _Conv1x1Params(hidden, self.dim, name="to_out")()
        g2 = _Gain(self.dim, name="out_norm")()

        env = os.environ.get("DMT_PALLAS_LINATTN")
        use_fused = self.fused_block
        if use_fused is None:
            use_fused = env == "1"
        elif env == "0":  # global kill switch, overrides the module flag
            use_fused = False
        if use_fused and not self.flash and residual is x:
            from diffusion_models_tpu.ops.pallas.linear_attn_block import (
                linear_attention_block,
            )

            xc = x.astype(self.dtype)
            if os.environ.get("DMT_LAB_4D") != "1":
                # default: token-major (B, N, C) kernel input. DMT_LAB_4D=1
                # hands the kernel the conv-shaped NHWC tensor directly
                # (H·W flattened inside VMEM) — an experiment against the
                # ~0.3 ms/site boundary relayout XLA schedules around the
                # host-graph reshape (docs/ROUND3_NOTES.md MFU table)
                xc = xc.reshape(b, n, c)
            out = linear_attention_block(
                xc,
                g1, wqkv, mem_kv,
                wout.reshape(hidden, self.dim), bout, g2,
                heads=self.heads, dim_head=self.dim_head,
                scale=self.dim_head**-0.5,
            )
            return out.reshape(b, h, w, c)

        # ---- jnp / flash paths ------------------------------------------
        xn = rms_film_silu(x.astype(self.dtype), g1, silu=False)
        tokens = xn.reshape(b, n, c)
        qkv = tokens @ wqkv.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.flash:
            from diffusion_models_tpu.ops.pallas.linear_attention import (
                fused_linear_attention,
            )

            # flash kernel keeps the (B, H, D, N) token-last layout
            to_hdn = lambda t: t.reshape(
                b, n, self.heads, self.dim_head
            ).transpose(0, 2, 3, 1)
            q, k, v = (to_hdn(t) for t in (q, k, v))
            mk = jnp.broadcast_to(mem_kv[0], (b,) + mem_kv[0].shape)
            mv = jnp.broadcast_to(mem_kv[1], (b,) + mem_kv[1].shape)
            k = jnp.concatenate([mk, k], axis=-1)
            v = jnp.concatenate([mv, v], axis=-1)
            out = fused_linear_attention(q, k, v, scale=self.dim_head**-0.5)
            out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        elif os.environ.get("DMT_LINATTN", "bnhd") == "bnhd":
            # DEFAULT: token-major (B, N, H, D): head split is a free
            # reshape, no layout copies of the big tensors (see
            # linear_attention_bnhd); the memory-KV slots are folded in
            # analytically so the token
            # axis stays at N = H·W (tile-aligned) instead of N+4 — the
            # concat variant misaligns every downstream k/v tensor
            to_nhd = lambda t: t.reshape(b, n, self.heads, self.dim_head)
            q, k, v = (to_nhd(t) for t in (q, k, v))
            mem_nhd = mem_kv.transpose(0, 3, 1, 2)  # (2, M, H, D)
            out = linear_attention_bnhd_memkv(
                q, k, v, mem_nhd[0], mem_nhd[1], scale=self.dim_head**-0.5
            )
            out = out.reshape(b, h, w, hidden)
        else:
            # opt-in (DMT_LINATTN=folded) — every tensor stays (B, N, H·D)
            # with a native 128-wide minor axis; per-head semantics restored
            # by a block-diagonal context mask. Measured SLOWER than the
            # bnhd path on-chip (349.7 vs 417.0 samples/s whole-model): the
            # heads^2-redundant F×F context matmul costs more than the
            # (H, D) tile padding it removes. Kept for parity-tested
            # reference (see linear_attention_folded_memkv docstring).
            mem_f = mem_kv.transpose(0, 3, 1, 2).reshape(2, -1, hidden)
            out = linear_attention_folded_memkv(
                q, k, v, mem_f[0], mem_f[1],
                heads=self.heads, scale=self.dim_head**-0.5,
            )
            out = out.reshape(b, h, w, hidden)

        # 1×1 output conv == matmul over the channel axis (+ bias)
        out = out @ wout.reshape(hidden, self.dim).astype(self.dtype)
        out = out + bout.astype(self.dtype)
        out = out.reshape(b, h, w, self.dim)
        # residual rides the out_norm fused epilogue (one pass, no extra add)
        return rms_film_silu(out, g2, residual=residual, silu=False)


class RMSNorm1D(nn.Module):
    """Token-feature RMS norm (reference `RMSNorm1D`,
    `denoising_diffusion_text_conditional.py:27-36`)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
        return ((x32 / jnp.maximum(norm, 1e-12)) * g * (self.dim**0.5)).astype(
            self.dtype
        )


class CrossAttention(nn.Module):
    """Image-tokens → text-context cross-attention
    (reference `CrossAttention`, `..._text_conditional.py:38-78`):
    q from (B, N, dim) image tokens; k/v from (B, M, context_dim) text;
    output projected back to dim and RMS-normalized."""

    dim: int
    context_dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        if context.ndim == 2:
            context = context[:, None, :]
        context = context.astype(self.dtype)
        inner = self.heads * self.dim_head

        dense = partial(
            nn.Dense, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32
        )
        q = dense(inner, name="to_q")(x)
        k = dense(inner, name="to_k")(context)
        v = dense(inner, name="to_v")(context)
        q, k, v = (_qkv_heads(t, self.heads) for t in (q, k, v))

        out = dot_product_attention(q, k, v, scale=self.dim_head**-0.5)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="to_out"
        )(out)
        return RMSNorm1D(self.dim, dtype=self.dtype, name="out_norm")(out)


class Downsample(nn.Module):
    """Space-to-depth (2×2) + 1×1 conv — the pixel-unshuffle downsample
    (`denoising_diffusion.py:54-57`). Lossless and MXU-friendly: the 1×1 conv
    over 4·C channels is a plain matmul."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # channel order (c, p1, p2) — matches the reference rearrange.
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c * 4)
        return nn.Conv(
            self.dim_out, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2× upsample + 3×3 conv (`denoising_diffusion.py:48-52`)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(
            self.dim_out, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)


class Unet(nn.Module):
    """The flagship 2D denoiser.

    Config surface mirrors the reference `Unet.__init__`
    (`denoising_diffusion.py:234-343`); inputs/outputs are NHWC.

    __call__(x, time, x_self_cond=None, train=False) -> (B, H, W, out_dim)
    """

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
    attn_dim_head: int | Tuple[int, ...] = 32
    attn_heads: int | Tuple[int, ...] = 4
    full_attn: Optional[Tuple[bool, ...]] = None
    # image conditioning: concat `cond` (B,H,W,cond_channels) to the input
    # ahead of the init conv (reference image-conditional Unet,
    # `denoising_diffusion_image_conditional.py:42-55`)
    cond_channels: int = 0
    # text conditioning (reference text-conditional Unet,
    # `denoising_diffusion_text_conditional.py:86-214`): either fuse a pooled
    # text embedding into the time embedding (embedding-concat mode) or apply
    # cross-attention at three bottleneck-adjacent points
    text_condition: bool = False
    text_emb_dim: int = 512
    use_cross_attn: bool = False
    # route full-attention blocks through the Pallas flash kernel
    flash_attn: bool = False
    # route LinearAttention blocks through the fused Pallas whole-block
    # kernel (`ops/pallas/linear_attn_block.py`, head-folded v2). None =
    # follow DMT_PALLAS_LINATTN (off unless =1). GaussianDiffusion clones
    # the model with this set for its samplers (train=False): the kernel is
    # +24% sampling throughput on v5e but its recompute-backward VJP costs
    # ~5% on the train step, so it is on for inference only by default.
    fused_attn_block: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    @property
    def default_out_dim(self) -> int:
        return self.channels * (2 if self.learned_variance else 1)

    def _time_mlp(self, time):
        time_dim = self.dim * 4
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim,
                is_random=self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)
        else:
            emb = SinusoidalPosEmb(
                self.dim, theta=self.sinusoidal_pos_emb_theta, name="sinu_pos_emb"
            )(time)
        emb = nn.Dense(
            time_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_dense1"
        )(emb.astype(self.dtype))
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(
            time_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_dense2"
        )(emb)
        return emb

    def _stage_plan(self):
        num_stages = len(self.dim_mults)
        full_attn = self.full_attn
        if not full_attn:
            full_attn = (False,) * (num_stages - 1) + (True,)
        full_attn = cast_tuple(tuple(full_attn), num_stages)
        attn_heads = cast_tuple(self.attn_heads, num_stages)
        attn_dim_head = cast_tuple(self.attn_dim_head, num_stages)
        assert len(full_attn) == num_stages
        init_dim = default(self.init_dim, self.dim)
        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        return dims, in_out, full_attn, attn_heads, attn_dim_head

    @nn.compact
    def __call__(
        self, x, time, x_self_cond=None, cond=None, *, train: bool = False,
        enc_cache=None, return_enc_cache: bool = False,
    ):
        """`enc_cache` / `return_enc_cache` implement encoder propagation
        (Faster Diffusion, arXiv:2312.09608): at "key" sampling steps the
        down-path activations (skip list + bottleneck input) are returned as
        a cache; at non-key steps the cached encoder features are reused and
        only init-conv + mid + decoder run (~40% of the FLOPs skipped).
        Opt-in via `GaussianDiffusion.ddim_sample(encoder_cache_interval=k)`;
        the default path is bit-identical to before."""
        assert all(
            divisible_by(d, self.downsample_factor) for d in x.shape[1:3]
        ), f"input spatial dims {x.shape[1:3]} must divide {self.downsample_factor}"

        # resolve the generic conditioning pytree
        image_cond = text_emb = None
        if isinstance(cond, dict):
            image_cond = cond.get("image")
            text_emb = cond.get("text")
        elif self.text_condition:
            text_emb = cond
        else:
            image_cond = cond

        if self.self_condition:
            x_self_cond = default(x_self_cond, lambda: jnp.zeros_like(x))
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        if exists(image_cond):
            assert self.cond_channels > 0, "set cond_channels to use image cond"
            assert image_cond.shape[0] == x.shape[0], "batch mismatch x vs cond"
            x = jnp.concatenate([x, image_cond.astype(x.dtype)], axis=-1)
        elif self.cond_channels > 0:
            # keep parameter shapes static when sampling unconditionally
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:3] + (self.cond_channels,), x.dtype)], axis=-1
            )

        dims, in_out, full_attn, attn_heads, attn_dim_head = self._stage_plan()
        init_dim = dims[0]
        num_resolutions = len(in_out)

        x = x.astype(self.dtype)
        x = nn.Conv(
            init_dim, (7, 7), dtype=self.dtype, param_dtype=jnp.float32,
            name="init_conv",
        )(x)
        r = x

        t = self._time_mlp(time)

        # text fusion, embedding-concat mode (`..._text_conditional.py:108-115,
        # 146-152`): project pooled text emb to time_dim, concat, re-project.
        if self.text_condition and not self.use_cross_attn and exists(text_emb):
            te = text_emb
            if te.ndim == 3 and te.shape[1] == 1:
                te = te[:, 0, :]
            te = te.astype(self.dtype)
            time_dim = self.dim * 4
            tf = nn.Dense(
                time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="text_proj_dense1",
            )(te)
            tf = nn.gelu(tf, approximate=False)
            tf = nn.Dense(
                time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="text_proj_dense2",
            )(tf)
            t = nn.Dense(
                time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="text_concat_proj",
            )(jnp.concatenate([t, tf], axis=-1))

        def _cross_attn(x, name):
            # token-level cross-attention at the bottleneck channel width
            # (`..._text_conditional.py:120-125,173-198`); output REPLACES the
            # features (no residual), matching the reference.
            b, hh, ww, cc = x.shape
            toks = x.reshape(b, hh * ww, cc)
            toks = CrossAttention(
                cc, self.text_emb_dim, heads=4,
                dim_head=cast_tuple(self.attn_dim_head, len(self.dim_mults))[-1],
                dtype=self.dtype, name=name,
            )(toks, text_emb)
            return toks.reshape(b, hh, ww, cc)

        use_xattn = self.text_condition and self.use_cross_attn and exists(text_emb)

        resnet = partial(ResnetBlock, dropout=self.dropout, dtype=self.dtype)

        if enc_cache is not None:
            hs = list(enc_cache[0])
            x = enc_cache[1]
        else:
            hs = []
            for ind, ((dim_in, dim_out), fa, heads, dim_head) in enumerate(
                zip(in_out, full_attn, attn_heads, attn_dim_head)
            ):
                is_last = ind >= (num_resolutions - 1)
                attn_cls = (
                    partial(Attention, flash=self.flash_attn)
                    if fa
                    else partial(
                        LinearAttention,
                        flash=self.flash_attn,
                        fused_block=self.fused_attn_block,
                    )
                )

                x = resnet(dim_in, name=f"down_{ind}_block1")(x, t, train=train)
                hs.append(x)
                x = resnet(dim_in, name=f"down_{ind}_block2")(x, t, train=train)
                x = attn_cls(
                    dim_in, heads=heads, dim_head=dim_head, dtype=self.dtype,
                    name=f"down_{ind}_attn",
                )(x, residual=x)
                hs.append(x)

                if not is_last:
                    x = Downsample(
                        dim_out, dtype=self.dtype, name=f"down_{ind}_down"
                    )(x)
                else:
                    x = nn.Conv(
                        dim_out, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"down_{ind}_conv",
                    )(x)
        new_cache = (tuple(hs), x)

        if use_xattn:
            x = _cross_attn(x, "cross_attn_down")

        mid_dim = dims[-1]
        x = resnet(mid_dim, name="mid_block1")(x, t, train=train)
        if use_xattn:
            x = _cross_attn(x, "cross_attn")
        x = Attention(
            mid_dim, heads=attn_heads[-1], dim_head=attn_dim_head[-1],
            flash=self.flash_attn, dtype=self.dtype, name="mid_attn",
        )(x, residual=x)
        x = resnet(mid_dim, name="mid_block2")(x, t, train=train)
        if use_xattn:
            x = _cross_attn(x, "cross_attn_up")

        for ind, ((dim_in, dim_out), fa, heads, dim_head) in enumerate(
            zip(
                reversed(in_out), reversed(full_attn),
                reversed(attn_heads), reversed(attn_dim_head),
            )
        ):
            is_last = ind == (num_resolutions - 1)
            attn_cls = (
                partial(Attention, flash=self.flash_attn)
                if fa
                else partial(
                    LinearAttention,
                    flash=self.flash_attn,
                    fused_block=self.fused_attn_block,
                )
            )

            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_out, name=f"up_{ind}_block1")(x, t, train=train)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = resnet(dim_out, name=f"up_{ind}_block2")(x, t, train=train)
            x = attn_cls(
                dim_out, heads=heads, dim_head=dim_head, dtype=self.dtype,
                name=f"up_{ind}_attn",
            )(x, residual=x)

            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up_{ind}_up")(x)
            else:
                x = nn.Conv(
                    dim_in, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"up_{ind}_conv",
                )(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = resnet(init_dim, name="final_res_block")(x, t, train=train)
        out_dim = default(self.out_dim, self.default_out_dim)
        x = nn.Conv(
            out_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="final_conv",
        )(x)
        out = x.astype(jnp.float32)
        if return_enc_cache:
            return out, new_cache
        return out
