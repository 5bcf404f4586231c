"""CIFAR-10 download + per-image PNG export.

Output-layout parity with the reference
`data/scripts/download_and_preprocess_cifar10.py:20-61`:
`data/cifar-10/{train_images,test_images}/{train,test}_%05d.png`.

Uses keras' CIFAR-10 loader (no torchvision in this environment); any
pre-downloaded `cifar-10-batches-py` also works via `--from_npz`.
"""

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def export(images: np.ndarray, folder: Path, prefix: str):
    folder.mkdir(parents=True, exist_ok=True)
    for i, img in enumerate(images):
        Image.fromarray(img).save(folder / f"{prefix}_{i:05d}.png")
    print(f"wrote {len(images)} images to {folder}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", type=str, default="data/cifar-10")
    p.add_argument("--from_npz", type=str, default=None,
                   help="optional local npz with x_train/x_test arrays")
    args = p.parse_args()

    if args.from_npz:
        data = np.load(args.from_npz)
        x_train, x_test = data["x_train"], data["x_test"]
    else:
        from tensorflow import keras  # downloads on first use

        (x_train, _), (x_test, _) = keras.datasets.cifar10.load_data()

    out = Path(args.out_dir)
    export(x_train.astype(np.uint8), out / "train_images", "train")
    export(x_test.astype(np.uint8), out / "test_images", "test")


if __name__ == "__main__":
    main()
