"""Profile the flagship DDIM sampler and train step: wall time, analytic
model-FLOPs utilization, and a per-op device-time breakdown.

MFU methodology (VERDICT round-2 item 1: "measure and report train-step
MFU — device-time, not tunneled steps/s"):
  - model FLOPs from `Compiled.cost_analysis()['flops']` (XLA's analytic
    count for the whole jitted program, so it includes the full scan),
  - device time from a perfetto trace (sum of TensorCore slice durations)
    when `--trace` is given, else wall time across `--runs` dispatches
    (upper bound: includes tunnel dispatch overhead),
  - peak = 197 TF/s bf16 for TPU v5e (`jax.devices()[0].device_kind`).

Usage:
    python scripts/profile_mfu.py --what sample --batch 256 --trace
    python scripts/profile_mfu.py --what train --batch 64
"""

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_FLOPS = 197e12


def build(batch, ddim_steps, flash):
    from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
    from diffusion_models_tpu.models.unet import Unet

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=3,
                 dtype=jnp.bfloat16, flash_attn=flash)
    diffusion = GaussianDiffusion(
        model, image_size=32, timesteps=1000, sampling_timesteps=ddim_steps
    )
    params = diffusion.init(jax.random.PRNGKey(0))
    return diffusion, params


def device_time_from_perfetto(logdir):
    """Sum TensorCore slice durations from the perfetto trace, and return
    (total_device_seconds, {op_name: seconds}) for the top ops."""
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None, {}
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TensorCore track pids (process names containing 'TPU' and thread
    # names like 'TensorCore'/'XLA Ops')
    name_by_pid = {}
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_time = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tids.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tname and "TensorCore" not in tname:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        op_time[e.get("name", "?")] += dur
        total += dur
    return total, dict(op_time)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["sample", "train"], default="sample")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    diffusion, params = build(args.batch, args.ddim_steps, args.flash)

    if args.what == "sample":
        def fn(params, rng):
            return diffusion.ddim_sample(
                params, rng, (args.batch, 32, 32, 3),
                sampling_timesteps=args.ddim_steps,
            )
        jitted = jax.jit(fn)
        example = (params, jax.random.PRNGKey(1))
        units_per_call = args.batch  # samples
        unit = "samples"
    else:
        import optax
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adam(2e-4, b1=0.9, b2=0.99))
        opt_state = tx.init(params)

        def fn(params, opt_state, rng, batch):
            def loss_fn(p):
                return diffusion.loss(p, rng, batch, train=False)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        jitted = jax.jit(fn, donate_argnums=(0, 1))
        batch = jnp.zeros((args.batch, 32, 32, 3), jnp.float32)
        example = (params, opt_state, jax.random.PRNGKey(1), batch)
        units_per_call = args.batch
        unit = "images"

    lowered = jitted.lower(*example)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = ca.get("flops", 0.0)
    bytes_accessed = ca.get("bytes accessed", 0.0)

    # warmup (note: donated args mean we must rebuild for train)
    out = jitted(*example)
    jax.block_until_ready(out)
    if args.what == "train":
        params, opt_state = out[0], out[1]
        example = (params, opt_state, jax.random.PRNGKey(2), example[3])

    logdir = "/tmp/mfu_trace"
    if args.trace:
        import shutil
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir, create_perfetto_trace=True)

    t0 = time.perf_counter()
    last = None
    for i in range(args.runs):
        if args.what == "train":
            params, opt_state, loss = jitted(
                params, opt_state, jax.random.PRNGKey(3 + i), example[3])
            last = loss
        else:
            last = jitted(params, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(last)
    wall = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()

    wall_per_call = wall / args.runs
    mfu_wall = flops / wall_per_call / V5E_BF16_FLOPS
    rec = {
        "what": args.what,
        "batch": args.batch,
        "flops_per_call": flops,
        "bytes_per_call": bytes_accessed,
        "wall_s_per_call": round(wall_per_call, 4),
        "throughput": round(units_per_call / wall_per_call, 2),
        "unit": f"{unit}/s",
        "mfu_wall": round(mfu_wall, 4),
        "arithmetic_intensity": round(flops / max(bytes_accessed, 1), 2),
    }

    if args.trace:
        dev_total, op_time = device_time_from_perfetto(logdir)
        if dev_total:
            dev_per_call = dev_total / (args.runs)
            rec["device_s_per_call"] = round(dev_per_call, 4)
            rec["mfu_device"] = round(flops / dev_per_call / V5E_BF16_FLOPS, 4)
            top = sorted(op_time.items(), key=lambda kv: -kv[1])[: args.top]
            rec["top_ops"] = [
                {"op": k[:110], "s": round(v / args.runs, 5),
                 "pct": round(100 * v / dev_total, 2)}
                for k, v in top
            ]
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
