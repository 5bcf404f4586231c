"""Build a CIFAR-like 32x32 natural-image-patch dataset with zero egress.

The reference's flagship benchmark is CIFAR-10 DDPM training with FID
milestones (reference `train/configs/ddpm_cifar.yaml`,
`denoising_diffusion/fid_evaluation.py:15-133`). This image has no network
egress and no CIFAR-10 on disk, so the real-data training run uses the only
real photographs available offline — the sample images bundled with
installed packages (sklearn `china.jpg`/`flower.jpg`, matplotlib
`grace_hopper.jpg`, pygame `camera_rgb.jpg`) — cropped into a multi-scale
32x32 patch distribution. The result is a genuine natural-image dataset
(tens of thousands of distinct crops across 5 scales + flips), suitable for
measuring a real training-loss and FID-vs-milestone trend end to end.

    python data/scripts/make_natural_patches.py --out data/natural_patches_32 \
        --num 50000 --size 32 --seed 0
"""

import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image


def _base_images():
    paths = []
    try:
        import sklearn.datasets

        img_dir = Path(sklearn.datasets.__file__).parent / "images"
        paths += [img_dir / "china.jpg", img_dir / "flower.jpg"]
    except ImportError:
        pass
    try:
        import matplotlib

        paths.append(
            Path(matplotlib.__file__).parent
            / "mpl-data" / "sample_data" / "grace_hopper.jpg"
        )
    except ImportError:
        pass
    try:
        import pygame

        p = (
            Path(pygame.__file__).parent
            / "docs" / "generated" / "_images" / "camera_rgb.jpg"
        )
        if p.exists():
            paths.append(p)
    except ImportError:
        pass
    imgs = []
    for p in paths:
        if p.exists():
            imgs.append(np.asarray(Image.open(p).convert("RGB")))
    if not imgs:
        raise RuntimeError("no bundled sample photographs found offline")
    return imgs


def make_patches(out_dir, num=50000, size=32, seed=0):
    rs = np.random.RandomState(seed)
    scales = (1.0, 0.75, 0.5, 0.35, 0.25)
    pyramid = []
    for img in _base_images():
        h, w = img.shape[:2]
        for s in scales:
            nh, nw = int(h * s), int(w * s)
            if nh < size or nw < size:
                continue
            im = Image.fromarray(img).resize((nw, nh), Image.LANCZOS)
            pyramid.append(np.asarray(im))
    print(f"{len(pyramid)} pyramid levels from {len(scales)} scales")

    out = Path(out_dir) / "train_images"
    out.mkdir(parents=True, exist_ok=True)
    for i in range(num):
        src = pyramid[rs.randint(len(pyramid))]
        h, w = src.shape[:2]
        y, x = rs.randint(h - size + 1), rs.randint(w - size + 1)
        patch = src[y : y + size, x : x + size]
        if rs.rand() < 0.5:
            patch = patch[:, ::-1]
        Image.fromarray(patch).save(out / f"{i:06d}.png")
        if (i + 1) % 10000 == 0:
            print(f"{i + 1}/{num}")
    print(f"wrote {num} {size}x{size} patches to {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/natural_patches_32")
    ap.add_argument("--num", type=int, default=50000)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    make_patches(a.out, a.num, a.size, a.seed)
