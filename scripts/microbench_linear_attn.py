"""Microbenchmark + parity check: fused linear-attention-block kernel vs
the jnp/XLA path, at the flagship's two linear-attention shapes.

    python scripts/microbench_linear_attn.py            # TPU measure
    python scripts/microbench_linear_attn.py --interpret # CPU parity only
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_models_tpu.ops.attention import linear_attention_bnhd
from diffusion_models_tpu.ops.pallas.linear_attn_block import (
    linear_attention_block,
)

HEADS, DIM_HEAD, M = 4, 32, 4


def jnp_block(x, g1, wqkv, mem_kv, wout, bout, g2):
    """The exact jnp composition `models/unet.py::LinearAttention` runs."""
    b, n, c = x.shape
    f32 = jnp.float32
    x32 = x.astype(f32)
    inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(x32 * x32, -1, keepdims=True),
                                    1e-24))
    xn = (x32 * inv * (g1 * c**0.5)).astype(x.dtype)
    qkv = (xn @ wqkv.astype(x.dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to_nhd = lambda t: t.reshape(b, n, HEADS, DIM_HEAD)
    q, k, v = (to_nhd(t) for t in (q, k, v))
    mem_nhd = mem_kv.astype(x.dtype).transpose(0, 3, 1, 2)  # (2, M, H, D)
    mk = jnp.broadcast_to(mem_nhd[0], (b,) + mem_nhd[0].shape)
    mv = jnp.broadcast_to(mem_nhd[1], (b,) + mem_nhd[1].shape)
    k = jnp.concatenate([mk, k], axis=1)
    v = jnp.concatenate([mv, v], axis=1)
    out = linear_attention_bnhd(q, k, v, scale=DIM_HEAD**-0.5)
    out = out.reshape(b, n, HEADS * DIM_HEAD)
    out = (out @ wout.astype(x.dtype) + bout.astype(x.dtype))
    o32 = out.astype(f32)
    inv2 = jax.lax.rsqrt(jnp.maximum(jnp.sum(o32 * o32, -1, keepdims=True),
                                     1e-24))
    return (o32 * inv2 * (g2 * c**0.5)).astype(x.dtype) + x


def run(b, n, c, dtype, interpret, runs=20):
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, dtype)
    x = f(b, n, c)
    g1 = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    g2 = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * HEADS * DIM_HEAD)) * c**-0.5,
                       jnp.float32)
    wout = jnp.asarray(rng.standard_normal((HEADS * DIM_HEAD, c)) * 0.09,
                       jnp.float32)
    bout = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    mem = jnp.asarray(rng.standard_normal((2, HEADS, DIM_HEAD, M)),
                      jnp.float32)

    fused = lambda: linear_attention_block(
        x, g1, wqkv, mem, wout, bout, g2,
        heads=HEADS, dim_head=DIM_HEAD, scale=DIM_HEAD**-0.5,
        interpret=interpret)
    ref = jax.jit(jnp_block)
    a = np.asarray(fused(), np.float32)
    r = np.asarray(ref(x, g1, wqkv, mem, wout, bout, g2), np.float32)
    err = np.max(np.abs(a - r)) / max(np.std(r), 1e-6)
    print(f"  ({b},{n},{c}) {dtype.__name__}: rel-max-err {err:.4f}")

    if interpret:
        return

    # NOTE: block_until_ready does NOT sync through the axon tunnel (a
    # chained 8k matmul "measures" 27,000 TF/s that way). Loop the op
    # INSIDE one jit via lax.scan and fetch a scalar, so host wall time is
    # dominated by real device work.
    ITERS = 50

    def make_loop(step):
        @jax.jit
        def loop(x0):
            def body(x, _):
                return step(x), ()
            xf, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(xf.astype(jnp.float32))
        return loop

    pallas_loop = make_loop(lambda xx: linear_attention_block(
        xx, g1, wqkv, mem, wout, bout, g2,
        heads=HEADS, dim_head=DIM_HEAD, scale=DIM_HEAD**-0.5))
    xla_loop = make_loop(lambda xx: jnp_block(
        xx, g1, wqkv, mem, wout, bout, g2))

    for fn, name in ((pallas_loop, "pallas"), (xla_loop, "xla")):
        float(fn(x))  # compile + warm
        t0 = time.perf_counter()
        float(fn(x))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"  {name}: {dt*1e3:.3f} ms/call (in-scan)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        import os
        jax.config.update("jax_platforms", "cpu")
        run(4, 64, 32, jnp.float32, True)
        run(2, 128, 64, jnp.float32, True)
    else:
        print("flagship shapes (bs 256):")
        run(256, 1024, 64, jnp.bfloat16, False)
        run(256, 256, 128, jnp.bfloat16, False)
        run(256, 64, 256, jnp.bfloat16, False)
