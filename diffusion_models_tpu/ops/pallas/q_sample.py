"""Fused q_sample (+ optional MSE-vs-noise reduction) Pallas kernel.

The training hot path noises a batch and compares the denoiser output to the
noise (`q_sample` + the MSE in `p_losses` — reference
`denoising_diffusion.py:811-867`). XLA fuses these chains well; this kernel
guarantees the minimal-HBM form for the two bandwidth-bound endpoints of the
train step:

  fused_q_sample:       x_t = √ᾱ_t·x0 + √(1−ᾱ_t)·ε  with the per-sample
                        coefficients gathered on-chip (one read of x0/ε,
                        one write of x_t).
  fused_mse_per_sample: per-sample mean((a−b)²) with a single pass
                        (read a, b once; write B scalars).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _to_tiles(a, b, feat, pad):
    a = a.reshape(b, -1).astype(jnp.float32)
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
    return a.reshape(b, (feat + pad) // 128, 128)


def _q_sample_kernel(coef_a_ref, coef_b_ref, x0_ref, noise_ref, o_ref):
    # one program per batch element; coefficients prefetched to SMEM
    i = pl.program_id(0)
    a = coef_a_ref[i]
    b = coef_b_ref[i]
    o_ref[...] = a * x0_ref[...] + b * noise_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_q_sample(x_start, noise, sqrt_ac_t, sqrt_om_ac_t,
                   interpret: bool | None = None):
    """x_start/noise: (B, ...) f32; sqrt_ac_t/sqrt_om_ac_t: (B,) gathered
    schedule coefficients. Returns x_t with one HBM pass.

    interpret=None auto-selects interpret mode off-TPU so the wired
    `use_pallas` paths run (slowly but correctly) in the CPU test mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x_start.shape[0]
    feat = x_start.reshape(b, -1).shape[1]
    pad = (-feat) % 128
    xt = _to_tiles(x_start, b, feat, pad)
    nt = _to_tiles(noise, b, feat, pad)
    r = xt.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _q_sample_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.float32),
        interpret=interpret,
    )(sqrt_ac_t.astype(jnp.float32), sqrt_om_ac_t.astype(jnp.float32), xt, nt)
    return out.reshape(b, feat + pad)[:, :feat].reshape(x_start.shape)


def _mse_kernel(count_ref, a_ref, b_ref, o_ref):
    i = pl.program_id(0)
    d = a_ref[...].astype(jnp.float32) - b_ref[...].astype(jnp.float32)
    # padded tail elements are zero in both inputs; divide by the true count
    o_ref[i, 0] = jnp.sum(d * d) / count_ref[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mse_per_sample(a, b, interpret: bool | None = None):
    """(B, ...) × 2 → (B,) per-sample mean squared error, one pass.

    Differentiable: the backward pass is the trivial closed form
    2·(a−b)/feat · ḡ (defined below via custom_vjp — Pallas calls have no
    automatic JVP rule, and the hand-written gradient is a single fused
    elementwise op under XLA anyway).
    """
    return _mse_fwd(a, b, interpret)[0]


def _mse_fwd(a, b, interpret=None):
    return _fused_mse_impl(a, b, interpret=interpret), (a, b)


def _mse_bwd(interpret, res, g):
    a, b = res
    feat = 1
    for d in a.shape[1:]:
        feat *= d
    g = g.reshape((a.shape[0],) + (1,) * (a.ndim - 1)).astype(jnp.float32)
    da = 2.0 / feat * (a.astype(jnp.float32) - b.astype(jnp.float32)) * g
    return da.astype(a.dtype), (-da).astype(b.dtype)


fused_mse_per_sample.defvjp(_mse_fwd, _mse_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mse_impl(a, b, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz = a.shape[0]
    feat = a.reshape(bsz, -1).shape[1]
    pad = (-feat) % 128
    fa = _to_tiles(a, bsz, feat, pad)
    fb = _to_tiles(b, bsz, feat, pad)
    r = fa.shape[1]
    count = jnp.full((1,), float(feat), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
        ],
        # whole-array SMEM output; each program writes its own row
        out_specs=pl.BlockSpec(
            (bsz, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM
        ),
    )
    out = pl.pallas_call(
        _mse_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        interpret=interpret,
    )(count, fa, fb)
    return out[:, 0]
