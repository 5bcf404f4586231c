"""Attention primitives for the denoiser networks.

TPU-native equivalent of the reference's `Attend` wrapper
(`denoising_diffusion/attend.py:38-124`): instead of dispatching between
einsum-attention and torch SDPA with CUDA-arch heuristics, we expose one
`dot_product_attention` whose matmuls hit the MXU directly; XLA fuses the
scale/softmax chain. Softmax is accumulated in f32 regardless of the compute
dtype (bf16-safe). Sequence lengths here are spatial H*W tokens (≤4096 at
64×64 inputs), so a full O(N²) attention in VMEM is the fastest layout; a
Pallas flash-attention path is provided in `ops/pallas/flash_attention.py`
for longer sequences.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """Multi-head attention over (B, H, N, D) tensors.

    Matches the reference einsum path (`attend.py:109-124`): softmax over the
    key axis with 1/sqrt(d) scaling (or an explicit `scale`).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale
    attn = jnp.exp(sim - jnp.max(sim, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    attn = attn.astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """Linear (efficient) attention over (B, H, D, N) tensors.

    Matches the reference's LinearAttention math
    (`denoising_diffusion.py:184-191`): q softmaxed over its feature axis,
    k softmaxed over the token axis, then two small D×D-contracted matmuls —
    O(N·D²) instead of O(N²·D). Both contractions run on the MXU; softmaxes
    accumulate in f32.
    """
    if scale is None:
        scale = q.shape[-2] ** -0.5  # dim_head ** -0.5

    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    q_sm = jnp.exp(q32 - jnp.max(q32, axis=-2, keepdims=True))
    q_sm = (q_sm / jnp.sum(q_sm, axis=-2, keepdims=True)).astype(v.dtype)
    k_sm = jnp.exp(k32 - jnp.max(k32, axis=-1, keepdims=True))
    k_sm = (k_sm / jnp.sum(k_sm, axis=-1, keepdims=True)).astype(v.dtype)

    q_sm = q_sm * scale
    context = jnp.einsum(
        "bhdn,bhen->bhde", k_sm, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    out = jnp.einsum(
        "bhde,bhdn->bhen", context, q_sm, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out


def linear_attention_bnhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """`linear_attention` over (B, N, H, D) tensors — the layout the qkv
    projection produces naturally ((B, N, H·D) split head-wise is a free
    reshape). Same math as `linear_attention` (q softmaxed over the feature
    axis, k over tokens, two D×D contractions), but with NO transposes of
    the token-major tensors: profiling the DDIM sampler showed the
    (B, H, D, N) layout costs ~5% of device time in pure layout copies
    around every attention site. Contractions are dot_generals with (b, h)
    batch dims and the token axis contracting — MXU-shaped (K = N ≥ 256).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    q_sm = jnp.exp(q32 - jnp.max(q32, axis=-1, keepdims=True))
    q_sm = (q_sm / jnp.sum(q_sm, axis=-1, keepdims=True)).astype(v.dtype)
    k_sm = jnp.exp(k32 - jnp.max(k32, axis=1, keepdims=True))
    k_sm = (k_sm / jnp.sum(k_sm, axis=1, keepdims=True)).astype(v.dtype)

    q_sm = q_sm * scale
    context = jnp.einsum(
        "bnhd,bnhe->bhde", k_sm, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    out = jnp.einsum(
        "bnhd,bhde->bnhe", q_sm, context, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out


def linear_attention_bnhd_memkv(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """`linear_attention_bnhd` with the learned memory-KV slots folded in
    analytically instead of concatenated onto the token axis.

    The reference prepends `num_mem_kv` learned tokens to k/v
    (`denoising_diffusion.py:165,184`), which on TPU turns every k/v tensor
    from N=H·W (a multiple of the (8, 128) tile) into N+4 — misaligning the
    token axis of the largest tensors in the network and forcing relayout
    copies around every linear-attention site. Linear attention is a sum
    over tokens, so the memory tokens' contribution to the softmax
    normalizer and to the k^T·v context can be added as a closed-form side
    term instead: softmax over the union {mem, real} equals
    exp(·−m)/(Z_real+Z_mem) with a shared max m. Same math as
    concatenation (up to f32 re-association), no unaligned tensors.

    q/k/v: (B, N, H, D); mem_k/mem_v: (M, H, D) — unbatched, broadcast-free.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    q32 = q.astype(jnp.float32)
    q_sm = jnp.exp(q32 - jnp.max(q32, axis=-1, keepdims=True))
    q_sm = (q_sm / jnp.sum(q_sm, axis=-1, keepdims=True)).astype(v.dtype)
    q_sm = q_sm * scale

    k32 = k.astype(jnp.float32)
    mk32 = mem_k.astype(jnp.float32)
    # shared stable max over the union of real and memory tokens
    m = jnp.maximum(
        jnp.max(k32, axis=1, keepdims=True),  # (B, 1, H, D)
        jnp.max(mk32, axis=0)[None, None],  # (1, 1, H, D)
    )
    # materialize the exp at compute dtype: the token-axis reduce forces a
    # two-pass schedule (exp must be stored between the z-reduce and the
    # divide), and storing it f32 costs a 134 MB HBM round-trip per N=1024
    # site (profiled: the f32[B,N,F] output of the split fusions). With f32
    # inputs (tests, oracles) this is a no-op cast.
    ek = jnp.exp(k32 - m).astype(v.dtype)  # (B, N, H, D)
    emk = jnp.exp(mk32[None] - m)  # (B, M, H, D)
    z = jnp.sum(ek.astype(jnp.float32), axis=1, keepdims=True) + jnp.sum(
        emk, axis=1, keepdims=True
    )
    k_sm = (ek / z.astype(v.dtype)).astype(v.dtype)
    mem_sm = (emk / z).astype(v.dtype)

    context = jnp.einsum(
        "bnhd,bnhe->bhde", k_sm, v, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bmhd,mhe->bhde",
        mem_sm,
        mem_v.astype(v.dtype),
        preferred_element_type=jnp.float32,
    )
    context = context.astype(v.dtype)
    # no preferred_element_type here: the MXU accumulates the d=32
    # contraction in f32 internally either way, and asking for an f32
    # result forces a separate materialize+downcast that XLA lowers as a
    # 0.22 ms layout copy per N=1024 site (profiled: copy.845/copy.939,
    # 3.7% of DDIM-step device time)
    out = jnp.einsum("bnhd,bhde->bnhe", q_sm, context)
    return out


def linear_attention_folded_memkv(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
) -> jnp.ndarray:
    """Head-FOLDED linear attention with analytic memory-KV: every
    materialized tensor is (B, N, F) or (B, F, F) with F = heads·dim_head.

    Why: the per-head layout (B, N, H, D) = (·, ·, 4, 32) puts (H, D) in the
    TPU's (8, 128)-tiled minor dims — an 8× tile-padding — which profiling
    showed makes these sites run ~15× slower inside the full model than
    standalone. Here the head axis is never materialized:

      - q's per-head feature softmax uses segment reduces (reshape happens
        only inside an XLA fusion, no padded tensor reaches HBM);
      - the context is ONE (F × F) matmul per batch element — MXU-native
        128×128 output instead of 16 tile-wasting 32×32 blocks — and the
        cross-head terms are zeroed afterwards by a block-diagonal mask,
        which restores exact per-head semantics (4× redundant MXU FLOPs,
        but these contractions are bandwidth-, not FLOP-, limited);
      - the output matmul consumes the masked context directly.

    Same math as `linear_attention_bnhd_memkv` up to f32 re-association.
    q/k/v: (B, N, F); mem_k/mem_v: (M, F); dim_head = F // heads.
    """
    b, n, f = q.shape
    d = f // heads
    if scale is None:
        scale = d**-0.5

    q32 = q.astype(jnp.float32)
    # segment (per-head) softmax over the feature axis: the (B, N, H, D)
    # view exists only inside the fused reduce, never in HBM
    qh = q32.reshape(b, n, heads, d)
    q_max = jnp.broadcast_to(
        jnp.max(qh, axis=-1, keepdims=True), qh.shape
    ).reshape(b, n, f)
    eq = jnp.exp(q32 - q_max)
    q_den = jnp.broadcast_to(
        jnp.sum(eq.reshape(b, n, heads, d), axis=-1, keepdims=True), qh.shape
    ).reshape(b, n, f)
    q_sm = ((eq / q_den) * scale).astype(v.dtype)

    # token softmax over the union {memory, real} — identical to the
    # unfolded analytic fold; head structure is irrelevant to this axis
    k32 = k.astype(jnp.float32)
    mk32 = mem_k.astype(jnp.float32)
    m = jnp.maximum(
        jnp.max(k32, axis=1, keepdims=True), jnp.max(mk32, axis=0)[None, None]
    )
    ek = jnp.exp(k32 - m)
    emk = jnp.exp(mk32[None] - m)
    z = jnp.sum(ek, axis=1, keepdims=True) + jnp.sum(emk, axis=1, keepdims=True)
    k_sm = (ek / z).astype(v.dtype)
    mem_sm = (emk / z).astype(v.dtype)

    context = jnp.einsum(
        "bnf,bng->bfg", k_sm, v, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bmf,mg->bfg",
        mem_sm,
        mem_v.astype(v.dtype),
        preferred_element_type=jnp.float32,
    )
    # zero the cross-head blocks: restores exact per-head contraction
    block_mask = jnp.asarray(
        np.kron(np.eye(heads, dtype=np.float32), np.ones((d, d), np.float32))
    )
    context = (context * block_mask).astype(v.dtype)
    out = jnp.einsum(
        "bnf,bfg->bng", q_sm, context, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out
