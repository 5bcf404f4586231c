"""Build a zero-egress paired image-conditional dataset: colorization.

Converts the natural-patch set into the `condition/<id>_A.png` /
`target/<id>_B.png` layout `ImageConditionalDataset` consumes (the same
layout the reference's edges2shoes prep produces —
`/root/reference/denoising-diffusion-pytorch/train/utils/data.py` pair
convention): condition = grayscale patch, target = the color original.

    python data/scripts/make_gray2color_pairs.py \
        --src data/natural_patches_32/train_images \
        --out data/gray2color_32 --n 20000
"""

import argparse
from pathlib import Path

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="data/natural_patches_32/train_images")
    p.add_argument("--out", default="data/gray2color_32")
    p.add_argument("--n", type=int, default=20000)
    args = p.parse_args()

    src = sorted(Path(args.src).glob("*.png"))[: args.n]
    cond_dir = Path(args.out) / "condition"
    tgt_dir = Path(args.out) / "target"
    cond_dir.mkdir(parents=True, exist_ok=True)
    tgt_dir.mkdir(parents=True, exist_ok=True)

    for i, path in enumerate(src):
        img = Image.open(path).convert("RGB")
        img.convert("L").convert("RGB").save(cond_dir / f"{i:06d}_A.png")
        img.save(tgt_dir / f"{i:06d}_B.png")
    print(f"wrote {len(src)} pairs under {args.out}")


if __name__ == "__main__":
    main()
