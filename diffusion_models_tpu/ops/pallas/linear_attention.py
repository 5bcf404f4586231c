"""Fused Pallas linear-attention kernel.

Linear attention (`ops/attention.linear_attention`, reference
`denoising_diffusion.py:184-191`) is a chain of two softmaxes, two small
contractions and several casts. As separate XLA ops the intermediates
(q_softmax, k_softmax, context) each round-trip HBM; at diffusion U-Net
shapes the attention stack is ~35% of the forward. This kernel computes the
whole chain per (batch·head) in VMEM:

    q' = softmax_D(q) · scale          (softmax over the FEATURE axis)
    k' = softmax_N(k)                  (softmax over tokens, padded cols
                                        masked to -inf)
    ctx = k' · vᵀ        (D×D)
    out = ctxᵀ · q'      (D×N)

Layout: (BH, D, N) with tokens on the lane axis — both contractions are
MXU matmuls, softmaxes in f32.

MEASURED RESULT (v5e, CIFAR U-Net dim 64, bs 256): this kernel is SLOWER
end-to-end than the XLA einsum path (22.1 vs 16.8 ms/fwd) — with D=32 the
per-(batch·head) programs are too small to fill the MXU, while XLA fuses the
whole stack into large batched contractions. It is therefore NOT the default
(`LinearAttention(flash=False)`); it exists for large-D/large-N regimes and
as a baseline for future multi-head-per-program blocking. The full-attention
Pallas kernel (`flash_attention.py`) IS a 4.2× win at N=4096.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from diffusion_models_tpu.ops.attention import linear_attention as xla_linear_attention

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, q_len: int, kv_len: int):
    q = q_ref[0].astype(jnp.float32)  # (D, Nq_pad)
    k = k_ref[0].astype(jnp.float32)  # (D, Mk_pad)
    v = v_ref[0].astype(jnp.float32)  # (D, Mk_pad)

    # q: softmax over the feature axis D (columns independent)
    q = q - jnp.max(q, axis=0, keepdims=True)
    q = jnp.exp(q)
    q = q / jnp.sum(q, axis=0, keepdims=True)
    q = q * scale

    # k: softmax over tokens, masking padded columns
    col = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k = jnp.where(col < kv_len, k, -jnp.inf)
    k = k - jnp.max(k, axis=1, keepdims=True)
    k = jnp.exp(k)
    k = k / jnp.sum(k, axis=1, keepdims=True)

    # padded v columns must not contribute: k is 0 there already (exp(-inf))
    ctx = jax.lax.dot_general(
        k, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, D) = Σ_n k[d,n]·v[e,n]

    out = jax.lax.dot_general(
        ctx, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (E=D, Nq): Σ_d ctx[d,e]·q[d,n]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_linear_attention(q, k, v, scale: float | None = None,
                           interpret: bool = False):
    """Drop-in for `ops.attention.linear_attention` over (B, H, D, N) /
    (B, H, D, M) tensors (M = N + memory-KV slots)."""
    b, h, d, n = q.shape
    m = k.shape[-1]
    if scale is None:
        scale = d**-0.5

    bh = b * h
    qf = q.reshape(bh, d, n)
    kf = k.reshape(bh, d, m)
    vf = v.reshape(bh, d, m)

    n_pad = _round_up(n, LANE)
    m_pad = _round_up(m, LANE)
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, n_pad - n)))
    kf = jnp.pad(kf, ((0, 0), (0, 0), (0, m_pad - m)))
    vf = jnp.pad(vf, ((0, 0), (0, 0), (0, m_pad - m)))

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, q_len=n, kv_len=m),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d, m_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d, m_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, n_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, d, n_pad), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :, :n].reshape(b, h, d, n)
