"""Karras magnitude-preserving U-Net (EDM2, arXiv 2312.02696), rank-generic.

Capability parity with the reference `karras_unet.py` (686 LoC),
`karras_unet_1d.py` (678) and `karras_unet_3d.py` (815): MP ops (MPSiLU,
MPCat eq.103, MPAdd eq.88, PixelNorm eq.30, forced weight-normalized
conv/linear per Algorithm 1, MPFourier embedding), config-G topology
(fig. 21: input block with ones-concat, `num_blocks_per_stage` encoders per
stage, attention at `attn_res` resolutions, MP-cat skips, two mid decoders,
gained output block), optional one-hot class conditioning via MPAdd, the
improvised MP transformer, and the inverse-sqrt-decay LR schedule (eq. 67).

The reference keeps three near-identical files for 1D/2D/3D; here ONE
implementation is parameterized by spatial rank — convs take (3,)*rank
kernels and resizes act on all spatial axes, everything channels-last.

Functional-weight-norm note: the reference renormalizes the stored weights
in place under no_grad each training step (Algorithm 1's "forced" part) and
ALSO normalizes in the forward. In JAX the forward normalization is
identical; the in-place renorm is provided as `normalize_karras_weights`,
which the trainer applies to the param pytree after each optimizer step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_models_tpu.ops.attention import dot_product_attention
from diffusion_models_tpu.utils.helpers import cast_tuple, default, exists


def mp_silu(x):
    return nn.silu(x) / 0.596


def mp_cat(a, b, t: float = 0.5):
    """Magnitude-preserving concat over channels (eq. 103)."""
    Na, Nb = a.shape[-1], b.shape[-1]
    C = math.sqrt((Na + Nb) / ((1.0 - t) ** 2 + t**2))
    a = a * (1.0 - t) / math.sqrt(Na)
    b = b * t / math.sqrt(Nb)
    return C * jnp.concatenate([a, b], axis=-1)


def mp_add(x, res, t: float):
    """Magnitude-preserving residual sum (eq. 88)."""
    return (x * (1.0 - t) + res * t) / math.sqrt((1 - t) ** 2 + t**2)


def pixel_norm(x, axis: int = -1, eps: float = 1e-4):
    """l2-normalize × sqrt(N) over `axis` (eq. 30, high eps per paper)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps) * math.sqrt(x.shape[axis])


def normalize_weight(weight, eps: float = 1e-4):
    """Unit-normalize each output filter, scaled to keep overall magnitude
    (Algorithm 1). `weight`: (..., fan_in components ..., dim_out) HWIO —
    normalization is over all axes but the last."""
    flat = weight.reshape(-1, weight.shape[-1])  # (fan_in, out)
    norm = jnp.linalg.norm(flat, axis=0, keepdims=True)
    normed = flat / jnp.maximum(norm, eps)
    normed = normed * math.sqrt(flat.shape[0])
    return normed.reshape(weight.shape)


def normalize_karras_weights(params):
    """Force stored MP weights back onto the normalized manifold — the JAX
    equivalent of the reference's in-place renorm during training. Apply to
    the model's param pytree after each optimizer step."""

    def maybe_norm(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "mp_weight" in names:
            return normalize_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_norm, params)


class MPConv(nn.Module):
    """Forced weight-normalized, bias-free conv (any rank)."""

    dim_out: int
    kernel_size: int = 3
    rank: int = 2
    concat_ones_to_input: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.concat_ones_to_input:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([ones, x], axis=-1)
        kshape = (self.kernel_size,) * self.rank + (x.shape[-1], self.dim_out)
        w = self.param("mp_weight", nn.initializers.normal(1.0), kshape, jnp.float32)
        fan_in = x.shape[-1] * self.kernel_size**self.rank
        w = normalize_weight(w) / math.sqrt(fan_in)
        dn = {
            1: ("NWC", "WIO", "NWC"),
            2: ("NHWC", "HWIO", "NHWC"),
            3: ("NDHWC", "DHWIO", "NDHWC"),
        }[self.rank]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1,) * self.rank, padding="SAME",
            dimension_numbers=dn,
        )


class MPLinear(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "mp_weight", nn.initializers.normal(1.0),
            (x.shape[-1], self.dim_out), jnp.float32,
        )
        w = normalize_weight(w) / math.sqrt(x.shape[-1])
        return x.astype(self.dtype) @ w.astype(self.dtype)


class Gain(nn.Module):
    @nn.compact
    def __call__(self, x):
        g = self.param("gain", nn.initializers.zeros, (), jnp.float32)
        return x * g


class MPFourierEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,), jnp.float32)
        w = jax.lax.stop_gradient(w)  # fixed random features
        freqs = x.astype(jnp.float32)[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate(
            [jnp.sin(freqs), jnp.cos(freqs)], axis=-1
        ) * math.sqrt(2)


class KarrasAttention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 64
    num_mem_kv: int = 4
    mp_add_t: float = 0.3
    rank: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        b = x.shape[0]
        spatial = x.shape[1:-1]
        n = math.prod(spatial)
        hidden = self.heads * self.dim_head

        qkv = MPConv(hidden * 3, 1, rank=self.rank, dtype=self.dtype,
                     name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (
            qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
        )
        mem_kv = self.param(
            "mem_kv", nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head), jnp.float32,
        ).astype(q.dtype)
        k = jnp.concatenate(
            [jnp.broadcast_to(mem_kv[0], (b,) + mem_kv[0].shape), k], axis=-2
        )
        v = jnp.concatenate(
            [jnp.broadcast_to(mem_kv[1], (b,) + mem_kv[1].shape), v], axis=-2
        )
        q, k, v = (pixel_norm(t, axis=-1) for t in (q, k, v))
        out = dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape((b,) + spatial + (hidden,))
        out = MPConv(self.dim, 1, rank=self.rank, dtype=self.dtype,
                     name="to_out")(out)
        return mp_add(out, res, self.mp_add_t)


def _resize_spatial(x, scale: float, rank: int):
    new_spatial = tuple(int(s * scale) for s in x.shape[1 : 1 + rank])
    return jax.image.resize(
        x, (x.shape[0],) + new_spatial + (x.shape[-1],), method="bilinear"
    )


class KarrasEncoder(nn.Module):
    dim_out: int
    emb_dim: Optional[int] = None
    dropout: float = 0.1
    mp_add_t: float = 0.3
    has_attn: bool = False
    attn_dim_head: int = 64
    attn_res_mp_add_t: float = 0.3
    downsample: bool = False
    rank: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None, *, train: bool = False):
        if self.downsample:
            x = _resize_spatial(x, 0.5, self.rank)
            x = MPConv(self.dim_out, 1, rank=self.rank, dtype=self.dtype,
                       name="downsample_conv")(x)
        x = pixel_norm(x, axis=-1)
        res = x

        x = mp_silu(x)
        x = MPConv(self.dim_out, 3, rank=self.rank, dtype=self.dtype,
                   name="block1_conv")(x)
        if exists(emb):
            scale = Gain(name="emb_gain")(
                MPLinear(self.dim_out, dtype=self.dtype, name="to_emb")(emb)
            ) + 1
            x = x * scale.reshape(
                (scale.shape[0],) + (1,) * self.rank + (self.dim_out,)
            )
        x = mp_silu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = MPConv(self.dim_out, 3, rank=self.rank, dtype=self.dtype,
                   name="block2_conv")(x)
        x = mp_add(x, res, self.mp_add_t)

        if self.has_attn:
            x = KarrasAttention(
                self.dim_out,
                heads=max(math.ceil(self.dim_out / self.attn_dim_head), 2),
                dim_head=self.attn_dim_head, mp_add_t=self.attn_res_mp_add_t,
                rank=self.rank, dtype=self.dtype, name="attn",
            )(x)
        return x


class KarrasDecoder(nn.Module):
    dim_out: int
    emb_dim: Optional[int] = None
    dropout: float = 0.1
    mp_add_t: float = 0.3
    has_attn: bool = False
    attn_dim_head: int = 64
    attn_res_mp_add_t: float = 0.3
    upsample: bool = False
    rank: int = 2
    dtype: jnp.dtype = jnp.float32

    @property
    def needs_skip(self):
        return not self.upsample

    @nn.compact
    def __call__(self, x, emb=None, *, train: bool = False):
        if self.upsample:
            x = _resize_spatial(x, 2.0, self.rank)

        if x.shape[-1] != self.dim_out:
            res = MPConv(self.dim_out, 1, rank=self.rank, dtype=self.dtype,
                         name="res_conv")(x)
        else:
            res = x

        x = mp_silu(x)
        x = MPConv(self.dim_out, 3, rank=self.rank, dtype=self.dtype,
                   name="block1_conv")(x)
        if exists(emb):
            scale = Gain(name="emb_gain")(
                MPLinear(self.dim_out, dtype=self.dtype, name="to_emb")(emb)
            ) + 1
            x = x * scale.reshape(
                (scale.shape[0],) + (1,) * self.rank + (self.dim_out,)
            )
        x = mp_silu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = MPConv(self.dim_out, 3, rank=self.rank, dtype=self.dtype,
                   name="block2_conv")(x)
        x = mp_add(x, res, self.mp_add_t)

        if self.has_attn:
            x = KarrasAttention(
                self.dim_out,
                heads=max(math.ceil(self.dim_out / self.attn_dim_head), 2),
                dim_head=self.attn_dim_head, mp_add_t=self.attn_res_mp_add_t,
                rank=self.rank, dtype=self.dtype, name="attn",
            )(x)
        return x


def _karras_plan(dim, dim_max, num_downsamples, num_blocks_per_stage,
                 attn_res, image_size):
    """Build (downs, ups, mids) layer-config lists mirroring the reference's
    append/prepend construction (`karras_unet.py:465-512`)."""
    downs, ups = [], []
    curr_dim, curr_res = dim, image_size
    attn_res = set(cast_tuple(attn_res))

    ups.insert(0, dict(dim_out=dim, has_attn=False, upsample=False))
    for _ in range(num_blocks_per_stage):
        downs.append(dict(dim_out=curr_dim, has_attn=False, downsample=False))
        ups.insert(0, dict(dim_out=curr_dim, has_attn=False, upsample=False))

    for _ in range(num_downsamples):
        dim_out = min(dim_max, curr_dim * 2)
        upsample = dict(dim_out=curr_dim, has_attn=curr_res in attn_res,
                        upsample=True)
        curr_res //= 2
        has_attn = curr_res in attn_res
        downs.append(dict(dim_out=dim_out, has_attn=has_attn, downsample=True))
        ups.insert(0, upsample)
        ups.insert(0, dict(dim_out=dim_out, has_attn=has_attn, upsample=False))
        for _ in range(num_blocks_per_stage):
            downs.append(dict(dim_out=dim_out, has_attn=has_attn,
                              downsample=False))
            ups.insert(0, dict(dim_out=dim_out, has_attn=has_attn,
                               upsample=False))
        curr_dim = dim_out

    mid_has_attn = curr_res in attn_res
    mids = [dict(dim_out=curr_dim, has_attn=mid_has_attn, upsample=False)] * 2
    return downs, ups, mids


class KarrasUnetND(nn.Module):
    """Rank-generic MP U-Net (config G)."""

    image_size: int
    rank: int = 2
    dim: int = 192
    dim_max: int = 768
    num_classes: Optional[int] = None
    channels: int = 4
    num_downsamples: int = 3
    num_blocks_per_stage: int = 4
    attn_res: Tuple[int, ...] = (16, 8)
    fourier_dim: int = 16
    attn_dim_head: int = 64
    mp_cat_t: float = 0.5
    mp_add_emb_t: float = 0.5
    attn_res_mp_add_t: float = 0.3
    resnet_mp_add_t: float = 0.3
    dropout: float = 0.1
    self_condition: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_factor(self):
        return 2**self.num_downsamples

    @property
    def needs_class_labels(self):
        return exists(self.num_classes)

    # MPFourier features condition on continuous noise levels, so this net
    # is valid for the σ-space processes (ElucidatedDiffusion asserts this)
    learned_sinusoidal_cond = True
    random_fourier_features = False
    self_conditionable = True

    @nn.compact
    def __call__(self, x, time, self_cond=None, class_labels=None,
                 *, train: bool = False):
        assert x.shape[1] == self.image_size and x.shape[-1] == self.channels

        if self.self_condition:
            self_cond = default(self_cond, lambda: jnp.zeros_like(x))
            x = jnp.concatenate([self_cond, x], axis=-1)

        emb_dim = self.dim * 4
        time_emb = MPLinear(emb_dim, dtype=self.dtype, name="time_linear")(
            MPFourierEmbedding(self.fourier_dim, name="fourier")(time)
        )

        assert exists(class_labels) == self.needs_class_labels
        if self.needs_class_labels:
            if jnp.issubdtype(class_labels.dtype, jnp.integer):
                class_labels = jax.nn.one_hot(class_labels, self.num_classes)
            class_labels = class_labels.astype(jnp.float32) * math.sqrt(
                self.num_classes
            )
            class_emb = MPLinear(emb_dim, dtype=self.dtype, name="class_linear")(
                class_labels
            )
            time_emb = mp_add(time_emb, class_emb, self.mp_add_emb_t)

        emb = mp_silu(time_emb)

        downs, ups, mids = _karras_plan(
            self.dim, self.dim_max, self.num_downsamples,
            self.num_blocks_per_stage, self.attn_res, self.image_size,
        )
        block_kwargs = dict(
            emb_dim=emb_dim, dropout=self.dropout,
            attn_dim_head=self.attn_dim_head,
            attn_res_mp_add_t=self.attn_res_mp_add_t,
            mp_add_t=self.resnet_mp_add_t, rank=self.rank, dtype=self.dtype,
        )

        x = MPConv(self.dim, 3, rank=self.rank, concat_ones_to_input=True,
                   dtype=self.dtype, name="input_block")(x.astype(self.dtype))
        skips = [x]

        for i, cfg in enumerate(downs):
            x = KarrasEncoder(
                cfg["dim_out"], has_attn=cfg["has_attn"],
                downsample=cfg["downsample"], name=f"down_{i}", **block_kwargs,
            )(x, emb, train=train)
            skips.append(x)

        for i, cfg in enumerate(mids):
            x = KarrasDecoder(
                cfg["dim_out"], has_attn=cfg["has_attn"], name=f"mid_{i}",
                **block_kwargs,
            )(x, emb, train=train)

        for i, cfg in enumerate(ups):
            if not cfg["upsample"]:  # needs_skip
                x = mp_cat(x, skips.pop(), t=self.mp_cat_t)
            x = KarrasDecoder(
                cfg["dim_out"], has_attn=cfg["has_attn"],
                upsample=cfg["upsample"], name=f"up_{i}", **block_kwargs,
            )(x, emb, train=train)

        x = MPConv(self.channels, 3, rank=self.rank, dtype=self.dtype,
                   name="output_conv")(x)
        return Gain(name="output_gain")(x).astype(jnp.float32)


KarrasUnet = partial(KarrasUnetND, rank=2)
KarrasUnet1D = partial(KarrasUnetND, rank=1)
KarrasUnet3D = partial(KarrasUnetND, rank=3)


class MPFeedForward(nn.Module):
    """MP transformer feedforward (reference :600-624)."""

    dim: int
    mult: int = 4
    mp_add_t: float = 0.3
    rank: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        inner = int(self.dim * self.mult)
        x = pixel_norm(x, axis=-1)
        x = MPConv(inner, 1, rank=self.rank, dtype=self.dtype, name="conv_in")(x)
        x = mp_silu(x)
        x = MPConv(self.dim, 1, rank=self.rank, dtype=self.dtype,
                   name="conv_out")(x)
        return mp_add(x, res, self.mp_add_t)


class MPImageTransformer(nn.Module):
    """Improvised MP transformer (reference :626-657)."""

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    num_mem_kv: int = 4
    ff_mult: int = 4
    residual_mp_add_t: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = KarrasAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                num_mem_kv=self.num_mem_kv, mp_add_t=self.residual_mp_add_t,
                dtype=self.dtype, name=f"attn_{i}",
            )(x)
            x = MPFeedForward(
                self.dim, mult=self.ff_mult, mp_add_t=self.residual_mp_add_t,
                dtype=self.dtype, name=f"ff_{i}",
            )(x)
        return x


def inv_sqrt_decay_schedule(base_lr: float, t_ref: int = 70000,
                            sigma_ref: float = 0.01):
    """optax learning-rate schedule: σ_ref/√max(t/t_ref, 1) (eq. 67).
    Use as `optax.adam(learning_rate=inv_sqrt_decay_schedule(...))`."""

    def schedule(step):
        return base_lr * sigma_ref / jnp.sqrt(
            jnp.maximum(step / t_ref, 1.0)
        )

    return schedule
