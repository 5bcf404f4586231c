"""CompVis-style convolutional VAE (VQ and KL variants) for latent diffusion.

Capability parity with the reference `latent-diffusion` autoencoders:
  - Encoder/Decoder: `ldm/modules/diffusionmodules/model.py:385-585`
    (GroupNorm(32, eps 1e-6) + swish ResnetBlocks, vanilla/linear/none
    attention, asymmetric-pad strided downsample, nearest upsample,
    `decoder.z_shape` contract consumed by the LDM wrappers at
    `train/train_ldm.py:71-72`).
  - VectorQuantizer: taming-transformers `VectorQuantizer2` semantics
    (β=0.25 commitment, straight-through estimator) — the reference imports
    taming (`ldm/models/autoencoder.py:11`); here it is implemented in-repo.
  - DiagonalGaussianDistribution: `ldm/modules/distributions/distributions.py
    :24-64`.
  - VQModel / AutoencoderKL module structure: `ldm/models/autoencoder.py:19-497`
    (encoder→quant_conv→quantize→post_quant_conv→decoder), minus the
    Lightning training machinery, which lives in `training/vae_trainer.py`
    as a plain JAX two-optimizer loop.

TPU-native: NHWC, bf16-capable compute with f32 GroupNorm statistics; the
nearest-codebook search in the quantizer is one (BHW, D)x(D, K) matmul on the
MXU rather than a cdist gather.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


class VAEGroupNorm(nn.Module):
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        # reference uses GroupNorm(32) and all its channel counts divide 32;
        # fall back to gcd for small test widths
        groups = math.gcd(x.shape[-1], self.num_groups)
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32)).astype(self.dtype)


class VAEResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_ch = self.out_channels or x.shape[-1]
        h = VAEGroupNorm(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(h)
        h = VAEGroupNorm(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions
    (`model.py:167-219`); 1×1-conv q/k/v, f32 softmax, residual."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = VAEGroupNorm(dtype=self.dtype, name="norm")(x)
        conv1 = lambda name: nn.Conv(
            c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = conv1("q")(hn).reshape(b, h * w, c)
        k = conv1("k")(hn).reshape(b, h * w, c)
        v = conv1("v")(hn).reshape(b, h * w, c)

        attn = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        attn = attn * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        out = conv1("proj_out")(out)
        return x + out


class VAEDownsample(nn.Module):
    """Asymmetric-pad (bottom/right) stride-2 conv (`model.py:77-96`)."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32, name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class VAEUpsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(
                x.shape[-1], (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                name="conv",
            )(x)
        return x


def _attn_for(attn_type: str, dtype):
    if attn_type == "vanilla":
        return lambda name: VAEAttnBlock(dtype=dtype, name=name)
    if attn_type == "none":
        return lambda name: (lambda x: x)
    raise ValueError(f"attn_type {attn_type} unknown")


class Encoder(nn.Module):
    """ddconfig-driven encoder → z (or 2z when double_z)."""

    ch: int
    out_ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    double_z: bool = True
    dropout: float = 0.0
    resamp_with_conv: bool = True
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        make_attn = _attn_for(self.attn_type, self.dtype)
        x = x.astype(self.dtype)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_in")(x)

        curr_res = self.resolution
        num_resolutions = len(self.ch_mult)
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = VAEResnetBlock(
                    block_out, dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, train=train)
                if curr_res in self.attn_resolutions:
                    h = make_attn(f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_resolutions - 1:
                h = VAEDownsample(
                    self.resamp_with_conv, dtype=self.dtype,
                    name=f"down_{i_level}_downsample",
                )(h)
                curr_res //= 2

        h = VAEResnetBlock(dropout=self.dropout, dtype=self.dtype,
                           name="mid_block_1")(h, train=train)
        h = make_attn("mid_attn_1")(h)
        h = VAEResnetBlock(dropout=self.dropout, dtype=self.dtype,
                           name="mid_block_2")(h, train=train)

        h = VAEGroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_out")(h)
        return h.astype(jnp.float32)


class Decoder(nn.Module):
    ch: int
    out_ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    double_z: bool = True  # unused by the decoder; kept for ddconfig parity
    dropout: float = 0.0
    resamp_with_conv: bool = True
    give_pre_end: bool = False
    tanh_out: bool = False
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32

    @property
    def z_shape(self):
        """NHWC latent shape (1, h, w, z_channels) — the API contract the LDM
        wrappers read (`ldm/models/latent_diffusion.py` via
        `decoder.z_shape`, reference `model.py:499`)."""
        curr_res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        return (1, curr_res, curr_res, self.z_channels)

    @nn.compact
    def __call__(self, z, *, train: bool = False):
        make_attn = _attn_for(self.attn_type, self.dtype)
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_in")(z.astype(self.dtype))

        h = VAEResnetBlock(dropout=self.dropout, dtype=self.dtype,
                           name="mid_block_1")(h, train=train)
        h = make_attn("mid_attn_1")(h)
        h = VAEResnetBlock(dropout=self.dropout, dtype=self.dtype,
                           name="mid_block_2")(h, train=train)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(
                    block_out, dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, train=train)
                if curr_res in self.attn_resolutions:
                    h = make_attn(f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = VAEUpsample(
                    self.resamp_with_conv, dtype=self.dtype,
                    name=f"up_{i_level}_upsample",
                )(h)
                curr_res *= 2

        if self.give_pre_end:
            return h.astype(jnp.float32)
        h = VAEGroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h.astype(jnp.float32)


# ------------------------------------------------------------- distributions


class DiagonalGaussianDistribution:
    """q(z|x) with diagonal covariance (`distributions.py:24-64`);
    parameters is (B, H, W, 2·C) = concat(mean, logvar)."""

    def __init__(self, parameters, deterministic: bool = False):
        self.parameters = parameters
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng):
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype
        )

    def kl(self, other=None):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample, dims=None):
        if self.deterministic:
            return jnp.zeros((sample.shape[0],))
        axes = dims or tuple(range(1, sample.ndim))
        logtwopi = np.log(2.0 * np.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes,
        )

    def mode(self):
        return self.mean


# ----------------------------------------------------------------- quantizer


class VectorQuantizer(nn.Module):
    """taming `VectorQuantizer2` semantics: nearest-codebook assignment with
    straight-through gradients and β-weighted commitment loss.

    TPU note: argmin over ||z - e||² expands to z·z − 2 z·e + e·e, whose only
    large term is one (B·H·W, D) × (D, K) matmul — MXU-friendly at any
    codebook size (reference computes torch cdist-style, same math).
    """

    n_e: int
    e_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        # z: (B, H, W, C=e_dim)
        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_e, maxval=1.0 / self.n_e
            ),
            (self.n_e, self.e_dim),
        )
        flat = z.reshape(-1, self.e_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ embedding.T
            + jnp.sum(embedding**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        z_q = embedding[idx].reshape(z.shape)

        loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z) ** 2
        ) + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)

        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)
        idx = idx.reshape(z.shape[:-1])
        return z_q, loss, idx


# ------------------------------------------------------------------- wrappers


class VQModel(nn.Module):
    """encoder → quant_conv → VectorQuantizer → post_quant_conv → decoder
    (`ldm/models/autoencoder.py:19-117`)."""

    ddconfig: dict
    n_embed: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = dict(self.ddconfig)
        self.encoder = Encoder(**cfg, dtype=self.dtype)
        self.decoder = Decoder(**cfg, dtype=self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, beta=0.25)
        self.quant_conv = nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32
        )
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    def encode(self, x, *, train: bool = False):
        h = self.encoder(x, train=train)
        h = self.quant_conv(h)
        return self.quantize(h)  # (quant, emb_loss, indices)

    def encode_to_prequant(self, x, *, train: bool = False):
        """Pre-quantization latents (`VQModelInterface.encode`,
        `autoencoder.py:318-327`)."""
        return self.quant_conv(self.encoder(x, train=train))

    def decode(self, quant, *, train: bool = False):
        return self.decoder(self.post_quant_conv(quant), train=train)

    def decode_prequant(self, h, *, train: bool = False):
        """Quantize-then-decode pre-quant latents — the `VQModelInterface.
        decode` behavior (`autoencoder.py:328-336`), pairing with
        `encode_to_prequant`."""
        quant, _, _ = self.quantize(h)
        return self.decode(quant, train=train)

    def decode_code(self, code_b):
        quant = self.quantize.embedding[code_b]
        return self.decode(quant)

    def __call__(self, x, *, train: bool = False):
        quant, diff, ind = self.encode(x, train=train)
        dec = self.decode(quant, train=train)
        return dec, diff, ind

    @property
    def z_shape(self):
        cfg = self.ddconfig
        curr = cfg["resolution"] // 2 ** (len(cfg["ch_mult"]) - 1)
        return (1, curr, curr, cfg["z_channels"])


class AutoencoderKL(nn.Module):
    """KL-regularized VAE (`ldm/models/autoencoder.py:339-478`)."""

    ddconfig: dict
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = dict(self.ddconfig)
        assert cfg.get("double_z", True), "AutoencoderKL needs double_z=True"
        self.encoder = Encoder(**cfg, dtype=self.dtype)
        self.decoder = Decoder(**cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.embed_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32
        )
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    def encode(self, x, *, train: bool = False) -> DiagonalGaussianDistribution:
        h = self.encoder(x, train=train)
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z, *, train: bool = False):
        return self.decoder(self.post_quant_conv(z), train=train)

    def __call__(self, x, rng=None, sample_posterior: bool = True,
                 *, train: bool = False):
        posterior = self.encode(x, train=train)
        if sample_posterior:
            assert rng is not None
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        dec = self.decode(z, train=train)
        return dec, posterior

    @property
    def z_shape(self):
        cfg = self.ddconfig
        curr = cfg["resolution"] // 2 ** (len(cfg["ch_mult"]) - 1)
        return (1, curr, curr, cfg["z_channels"])


class IdentityFirstStage:
    """No-op first stage (`autoencoder.py:480-497`)."""

    def encode(self, x, *args, **kwargs):
        return x

    def decode(self, x, *args, **kwargs):
        return x

    def __call__(self, x, *args, **kwargs):
        return x
