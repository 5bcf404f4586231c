"""Headline benchmark: CIFAR-10 DDPM DDIM-50 sampling throughput per chip.

North-star metric (BASELINE.json): samples/sec/chip at DDIM-50 on the
reference's CIFAR-10 config (Unet dim 64 × (1,2,4,8), 32×32, T=1000),
targeting ≥2× A100 throughput per TPU v5e chip.

The reference publishes no numbers (BASELINE.md), so two denominators are
reported, clearly labeled:
  - `vs_baseline` / `a100_est_samples_per_sec`: ratio against a documented
    ENGINEERING ESTIMATE of the PyTorch reference on A100 (the reference
    drives 50 sequential host-side U-Net calls per batch,
    `denoising_diffusion.py:667-708`, eager fp16 torch; ~100 samples/sec on
    A100-class hardware). An estimate, not a measurement.
  - `torch_cpu_samples_per_sec` / `vs_torch_cpu`: a MEASURED run of the
    reference-architecture U-Net's DDIM-50 host loop with torch on THIS
    host's CPU (`scripts/bench_torch_reference.py`, stored in
    `results/torch_cpu_baseline.json`). Apples-to-oranges hardware-wise,
    but a real measurement of the reference code pattern.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat runs skip the ~5-min TPU compile
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dmt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

A100_EST_SAMPLES_PER_SEC = 100.0
BATCH = 256
DDIM_STEPS = 50


def main():
    from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
    from diffusion_models_tpu.models.unet import Unet

    model = Unet(
        dim=64, dim_mults=(1, 2, 4, 8), channels=3, dtype=jnp.bfloat16
    )
    diffusion = GaussianDiffusion(
        model, image_size=32, timesteps=1000, sampling_timesteps=DDIM_STEPS
    )
    params = diffusion.init(jax.random.PRNGKey(0))

    @jax.jit
    def sample(params, rng):
        return diffusion.ddim_sample(
            params, rng, (BATCH, 32, 32, 3), sampling_timesteps=DDIM_STEPS
        )

    # warmup / compile
    out = sample(params, jax.random.PRNGKey(1))
    out.block_until_ready()

    runs = 3
    t0 = time.perf_counter()
    for i in range(runs):
        out = sample(params, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    samples_per_sec = runs * BATCH / dt / n_chips

    record = {
        "metric": "cifar10_ddpm_ddim50_sampling_throughput",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / A100_EST_SAMPLES_PER_SEC, 3),
        "a100_est_samples_per_sec": A100_EST_SAMPLES_PER_SEC,
    }
    # measured torch-CPU reference loop on this host (see module docstring)
    baseline_file = (
        __import__("pathlib").Path(__file__).parent
        / "results" / "torch_cpu_baseline.json"
    )
    if baseline_file.exists():
        torch_cpu = json.loads(baseline_file.read_text())
        record["torch_cpu_samples_per_sec"] = torch_cpu["value"]
        record["vs_torch_cpu"] = round(samples_per_sec / torch_cpu["value"], 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
