"""Dispatch-amortization sweep: train-step throughput vs `steps_per_call`.

The Trainer fuses k optimizer steps into one jitted `lax.scan` dispatch
(`training/trainer.py::steps_per_call`, equivalence-tested). Through the
tunneled single-chip attach each dispatch costs host round-trip latency,
so k trades dispatch overhead against checkpoint/logging granularity.
This sweep measures the flagship train configuration (Unet dim 64 ×
(1,2,4,8), bs 64, Adam+clip+EMA in-step) at several k and prints one JSON
line per point.

    python scripts/sweep_steps_per_call.py --ks 1 5 10 25 50
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 5, 10, 25, 50])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--calls", type=int, default=5)
    args = ap.parse_args()

    import optax

    from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
    from diffusion_models_tpu.models.unet import Unet

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=3,
                 dtype=jnp.bfloat16)
    diffusion = GaussianDiffusion(model, image_size=32, timesteps=1000)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(2e-4, b1=0.9, b2=0.99))

    for k in args.ks:
        params = diffusion.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)

        def one_step(carry, inp):
            params, opt_state = carry
            rng, batch = inp

            def loss_fn(p):
                return diffusion.loss(p, rng, batch, train=False)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        def fused(params, opt_state, rngs, batches):
            (params, opt_state), losses = jax.lax.scan(
                one_step, (params, opt_state), (rngs, batches)
            )
            return params, opt_state, losses[-1]

        jitted = jax.jit(fused, donate_argnums=(0, 1))
        batches = jnp.zeros((k, args.batch, 32, 32, 3), jnp.float32)
        rngs = jax.random.split(jax.random.PRNGKey(1), k)

        params, opt_state, _ = jax.block_until_ready(
            jitted(params, opt_state, rngs, batches))  # warmup/compile
        t0 = time.perf_counter()
        for i in range(args.calls):
            params, opt_state, loss = jitted(
                params, opt_state,
                jax.random.split(jax.random.PRNGKey(2 + i), k), batches)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        steps = k * args.calls
        print(json.dumps({
            "steps_per_call": k,
            "steps_per_sec": round(steps / dt, 2),
            "img_per_sec": round(steps * args.batch / dt, 1),
            "wall_ms_per_call": round(1e3 * dt / args.calls, 2),
        }))


if __name__ == "__main__":
    main()
