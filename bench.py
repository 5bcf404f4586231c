"""Headline benchmark: CIFAR-10 DDPM DDIM-50 sampling throughput per chip.

North-star metric (BASELINE.json): samples/sec/chip at DDIM-50 on the
reference's CIFAR-10 config (Unet dim 64 × (1,2,4,8), 32×32, T=1000),
targeting ≥2× A100 throughput per TPU v5e chip.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
ratio against a documented engineering estimate of the PyTorch reference on
A100: the reference drives 50 sequential host-side U-Net calls per batch
(`denoising_diffusion.py:667-708`) with eager fp16 torch; at batch 64 that
measures in the ~100 samples/sec range on A100-class hardware. We use
A100_EST = 100.0 samples/sec as the denominator until a measured baseline is
recorded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
    print(
        json.dumps(
            {
                "metric": "cifar10_ddpm_ddim50_sampling_throughput",
                "value": round(samples_per_sec, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / A100_EST_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
