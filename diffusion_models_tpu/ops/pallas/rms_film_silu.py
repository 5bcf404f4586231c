"""RMSNorm → FiLM scale-shift → SiLU → residual epilogue, one call site.

The reference applies these as separate torch modules
(`denoising_diffusion.py:105-122`: conv → RMSNorm → scale_shift → SiLU).
Here the whole epilogue is a single expression so XLA schedules it as one
reduce pass + one fused elementwise pass (including the residual add).

A one-pass Pallas kernel (1 HBM read + 1 write instead of 2R+1W) is also
provided — the round-2 profile suggested the norm reduce+scale pairs as a
fusion candidate. MEASURED OUTCOME (round 3, flagship DDIM-50 bs256,
v5e): the Pallas routing REGRESSED throughput 426.7 → 248.8 samples/s.
Mid-graph `pallas_call`s pin layouts and broke XLA's global layout
assignment (copy ops grew from ~5% to 28% of device time), and the c=64
outer stages waste half the 128-lane width. XLA wins this one; the kernel
stays available behind `DMT_PALLAS_NORM=1` for re-measurement on other
shapes, and its interpret-mode tests keep it honest.

Semantics in both paths match `models/unet.py::RMSNorm` exactly: f32
accumulation, `x * rsqrt(max(sum(x^2, -1), 1e-24)) * (g * sqrt(C))`, then
optionally `* (scale + 1) + shift`, SiLU, cast to the input dtype, and a
post-cast residual add.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# opt-in: the Pallas path lost to XLA's fusion on the flagship model (see
# the measurement note in `_rms_film_silu`); flip only to re-measure.
_PALLAS_NORM = os.environ.get("DMT_PALLAS_NORM", "0") == "1"


def _kernel(x_ref, g_ref, s_ref, b_ref, r_ref, o_ref, *, film: bool,
            silu: bool, res: bool):
    cdtype = o_ref.dtype
    x = x_ref[...].astype(jnp.float32)  # (BT, N, C)
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
    )
    # norm reduce+scale in f32, then the epilogue in the compute dtype —
    # matches `_reference_impl` (and the pre-fusion modules) bit-for-bit
    out = (x * inv * g_ref[...].astype(jnp.float32)).astype(cdtype)
    if film:
        out = out * (s_ref[...].astype(cdtype) + jnp.asarray(1.0, cdtype))
        out = out + b_ref[...].astype(cdtype)
    if silu:
        out = out * jax.nn.sigmoid(out)
    if res:
        out = out + r_ref[...]
    o_ref[...] = out


def _batch_tile(b: int, n: int, c: int, itemsize: int) -> int:
    """Largest power-of-2 divisor of b keeping the x block ≤ ~1 MB (the
    kernel holds the block in f32 plus in/out double-buffers in VMEM)."""
    per_elem = n * c * itemsize
    bt = 1
    while bt * 2 <= b and b % (bt * 2) == 0 and (bt * 2) * per_elem <= 1 << 20:
        bt *= 2
    return bt


def _rms_film_silu_fwd_pallas(x, g, scale, shift, residual, silu,
                              interpret: bool = False):
    """x: (B, H, W, C); g: (C,); scale/shift: (B, C) or None;
    residual: (B, H, W, C) or None. `interpret=True` runs the kernel in the
    Pallas interpreter (CPU) — used by tests to cover the kernel logic
    without TPU hardware."""
    b, h, w, c = x.shape
    n = h * w
    film = scale is not None
    res = residual is not None
    xr = x.reshape(b, n, c)
    gr = (g * (c**0.5)).reshape(1, 1, c)

    bt = _batch_tile(b, n, c, x.dtype.itemsize)
    grid = (b // bt,)

    big = pl.BlockSpec((bt, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    per_b = pl.BlockSpec((bt, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    zero = jnp.zeros((1, 1, c), x.dtype)  # static dummy, negligible DMA

    in_specs = [big, const]
    args = [xr, gr]
    if film:
        in_specs += [per_b, per_b]
        args += [scale.reshape(b, 1, c), shift.reshape(b, 1, c)]
    else:
        in_specs += [const, const]
        args += [zero, zero]
    if res:
        in_specs += [big]
        args += [residual.reshape(b, n, c).astype(x.dtype)]
    else:
        in_specs += [const]
        args += [zero]

    out = pl.pallas_call(
        partial(_kernel, film=film, silu=silu, res=res),
        grid=grid,
        in_specs=in_specs,
        out_specs=big,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, w, c)


def _reference_impl(x, g, scale, shift, residual, silu):
    """Plain-jnp twin of the kernel (used for the VJP recompute and as the
    CPU fallback — Pallas TPU kernels don't run on the CPU test mesh).

    Only the norm reduce+scale runs in f32; FiLM/SiLU run in the compute
    dtype, exactly like the pre-fusion modules did (bf16 VPU elementwise is
    2× the f32 rate — keeping the epilogue in bf16 measured ~5% faster
    end-to-end than the all-f32 variant)."""
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x32 * x32, axis=-1, keepdims=True), 1e-24)
    )
    out = (x32 * inv * (g.astype(jnp.float32) * c**0.5)).astype(x.dtype)
    if scale is not None:
        one = jnp.asarray(1.0, x.dtype)
        out = out * (scale.astype(x.dtype)[:, None, None, :] + one)
        out = out + shift.astype(x.dtype)[:, None, None, :]
    if silu:
        out = out * jax.nn.sigmoid(out)
    if residual is not None:
        out = out + residual.astype(x.dtype)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rms_film_silu(x, g, scale, shift, residual, silu):
    # Pallas-path entry ONLY (custom_vjp because XLA can't autodiff through
    # pallas_call). The default jnp path must NOT route through this
    # wrapper: a custom_vjp boundary blocks XLA's forward/backward fusion
    # at every norm site, which measurably slows training.
    if jax.default_backend() == "tpu":
        return _rms_film_silu_fwd_pallas(x, g, scale, shift, residual, silu)
    return _reference_impl(x, g, scale, shift, residual, silu)


def _fwd(x, g, scale, shift, residual, silu):
    out = _rms_film_silu(x, g, scale, shift, residual, silu)
    # `residual` itself is not needed to differentiate (its grad is just
    # `grad`), but None-vs-array decides the output pytree structure.
    return out, (x, g, scale, shift, None if residual is None else ())


def _bwd(silu, saved, grad):
    x, g, scale, shift, res_tag = saved
    had_res = res_tag is not None
    film = scale is not None
    if film:
        _, vjp = jax.vjp(
            lambda x, g, s, b: _reference_impl(x, g, s, b, None, silu),
            x, g, scale, shift,
        )
        dx, dg, dscale, dshift = vjp(grad)
    else:
        _, vjp = jax.vjp(
            lambda x, g: _reference_impl(x, g, None, None, None, silu), x, g
        )
        dx, dg = vjp(grad)
        dscale = dshift = None
    dres = grad if had_res else None
    return dx, dg, dscale, dshift, dres


_rms_film_silu.defvjp(_fwd, _bwd)


def rms_film_silu(x, g, scale=None, shift=None, residual=None, *,
                  silu: bool = True):
    """Fused RMSNorm(+FiLM)(+SiLU)(+residual add) over the channel axis of
    (B, H, W, C).

    `g` is the raw per-channel gain (the sqrt(C) factor is applied inside,
    matching `models/unet.py::RMSNorm`). `scale`/`shift` are per-sample FiLM
    vectors of shape (B, C), applied as `(scale + 1) * x + shift`
    (reference `denoising_diffusion.py:117-119`). `residual` is added after
    the final cast, matching the unfused `h + x`.

    DEFAULT path: the plain expression, differentiated by XLA autodiff —
    one fused fwd pass and full fwd/bwd fusion freedom. The Pallas kernel
    (and the custom_vjp it requires) is opt-in via DMT_PALLAS_NORM=1; the
    measured outcome on the flagship model is in the module docstring.
    MEASURED (round 3): leaving every norm site behind the custom_vjp even
    on the jnp path slowed the flagship TRAIN step ~8× (26 → 3.2 steps/s,
    CFG bs64 steps_per_call=10) — the boundary blocks XLA's fwd/bwd fusion
    and forces per-site rematerialization.
    """
    assert (scale is None) == (shift is None)
    if _PALLAS_NORM:
        return _rms_film_silu(x, g, scale, shift, residual, silu)
    return _reference_impl(x, g, scale, shift, residual, silu)
