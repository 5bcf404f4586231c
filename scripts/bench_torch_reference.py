"""Measured torch-CPU baseline for bench.py's denominator.

Reconstructs the reference-architecture U-Net (the same oracle the converter
parity tests use, `tests/test_torch_oracle_models.py::TUnet` — reference
layer list from `denoising_diffusion.py:233-390`) at the flagship CIFAR
scale and times the reference's host-driven DDIM-50 sampling loop
(`denoising_diffusion.py:667-708`: one eager model call + elementwise update
per step) on this host's CPU with torch.

Writes `results/torch_cpu_baseline.json`; `bench.py` reports the figure as
`torch_cpu_samples_per_sec` next to the A100 engineering estimate, so at
least one denominator is a measurement rather than a guess.

    python scripts/bench_torch_reference.py [--batch 16] [--steps 50]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import torch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--repeats", type=int, default=1)
    args = p.parse_args()

    from test_torch_oracle_models import TUnet

    torch.manual_seed(0)
    model = TUnet(
        dim=64, dim_mults=(1, 2, 4, 8), channels=3,
        attn_heads=4, attn_dim_head=32,
    ).eval()

    b, steps = args.batch, args.steps
    # reference DDIM constant per step pair (exact values don't affect time)
    alpha, alpha_next = 0.99, 0.995

    @torch.no_grad()
    def ddim_loop():
        img = torch.randn(b, 3, 32, 32)
        for i in range(steps):
            t = torch.full((b,), steps - 1 - i, dtype=torch.long)
            pred_noise = model(img, t)
            # reference update: x̂0 from noise, clip, recombine (:684-701)
            x_start = (img - (1 - alpha) ** 0.5 * pred_noise) / alpha**0.5
            x_start = x_start.clamp(-1, 1)
            img = x_start * alpha_next**0.5 + (1 - alpha_next) ** 0.5 * pred_noise
        return img

    # warmup (torch CPU first-call allocator/threading setup)
    small = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        model(small, torch.zeros(1, dtype=torch.long))

    t0 = time.perf_counter()
    for _ in range(args.repeats):
        ddim_loop()
    dt = time.perf_counter() - t0
    samples_per_sec = args.repeats * b / dt

    out = {
        "metric": "torch_cpu_ddim50_sampling_throughput",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec",
        "batch": b,
        "ddim_steps": steps,
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
        "note": "reference-architecture U-Net (dim 64 x (1,2,4,8)), "
                "host-driven DDIM loop, eager fp32 torch on this host's CPU",
    }
    dst = Path(__file__).resolve().parents[1] / "results" / "torch_cpu_baseline.json"
    dst.parent.mkdir(exist_ok=True)
    dst.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
