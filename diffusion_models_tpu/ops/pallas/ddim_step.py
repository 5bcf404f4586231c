"""Fused DDIM update kernel.

One DDIM reverse step after the denoiser call is a chain of elementwise ops
over the image (x̂0 derivation, clip, ε̂ re-derivation, blended update —
reference `ddim_sample` :684-701). XLA fuses most of this already; this
Pallas kernel guarantees a SINGLE HBM round-trip for the whole update
(read x_t, ε̂-prediction, noise once; write x_{t-1} once), which matters at
large batch where the sampler is bandwidth-bound between U-Net calls.

Computes (for the pred_noise objective with clip + rederive, the reference
default sampling path):
    x0   = clip(a·x − b·ε̂, −1, 1)          a = √(1/ᾱ_t), b = √(1/ᾱ_t − 1)
    ε̂'   = (a·x − x0) / b
    out  = x0·√ᾱ_next + c·ε̂' + σ·z
The five scalar coefficients ride the scalar-prefetch path (SMEM); the grid
is one program per batch row with VMEM blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ddim_kernel(coef_ref, x_ref, eps_ref, noise_ref, o_ref):
    a = coef_ref[0]          # sqrt_recip_alphas_cumprod[t]
    b = coef_ref[1]          # sqrt_recipm1_alphas_cumprod[t]
    alpha_next_sqrt = coef_ref[2]
    c = coef_ref[3]
    sigma = coef_ref[4]

    x = x_ref[...].astype(jnp.float32)
    eps = eps_ref[...].astype(jnp.float32)
    noise = noise_ref[...].astype(jnp.float32)

    x0 = jnp.clip(a * x - b * eps, -1.0, 1.0)
    eps_re = (a * x - x0) / b
    out = x0 * alpha_next_sqrt + c * eps_re + sigma * noise
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ddim_step(x, eps_pred, noise, coefs,
                    interpret: bool | None = None):
    """x, eps_pred, noise: (B, ...) arrays; coefs: (5,) f32 scalars
    [sqrt_recip_ac, sqrt_recipm1_ac, sqrt(alpha_next), c, sigma].

    interpret=None auto-selects interpret mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    flat = x.reshape(b, -1)
    feat = flat.shape[1]
    # lane-align: (B, F) -> (B, R, 128) so per-sample blocks satisfy the
    # (sublane, lane) tiling constraints
    pad = (-feat) % 128
    def to_tiles(a):
        a = a.reshape(b, -1)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(b, (feat + pad) // 128, 128)

    xt, epst, noiset = to_tiles(flat), to_tiles(eps_pred), to_tiles(noise)
    r = xt.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, 128), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _ddim_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(xt.shape, x.dtype),
        interpret=interpret,
    )(coefs.astype(jnp.float32), xt, epst, noiset)
    return out.reshape(b, feat + pad)[:, :feat].reshape(x.shape)
