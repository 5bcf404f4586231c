"""edges2shoes download + paired-split export.

Output-layout parity with the reference
`data/scripts/download_and_preprocess_edges2shoes.py:31-52`: each paired
image (edge map | photo, side by side) is split into
`condition/<id>_A.jpg` and `target/<id>_B.jpg`.
"""

import argparse
import tarfile
import urllib.request
from pathlib import Path

from PIL import Image

URL = "http://efrosgans.eecs.berkeley.edu/pix2pix/datasets/edges2shoes.tar.gz"


def split_pairs(src_folder: Path, out_root: Path):
    cond_dir = out_root / "condition"
    target_dir = out_root / "target"
    cond_dir.mkdir(parents=True, exist_ok=True)
    target_dir.mkdir(parents=True, exist_ok=True)

    count = 0
    for img_path in sorted(src_folder.glob("*.jpg")):
        img = Image.open(img_path)
        w, h = img.size
        half = w // 2
        stem = img_path.stem
        img.crop((0, 0, half, h)).save(cond_dir / f"{stem}_A.jpg")
        img.crop((half, 0, w, h)).save(target_dir / f"{stem}_B.jpg")
        count += 1
    print(f"split {count} pairs into {out_root}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", type=str, default="data/edges2shoes")
    p.add_argument("--tar_path", type=str, default=None,
                   help="use a pre-downloaded tar instead of fetching")
    p.add_argument("--splits", nargs="+", default=["train", "val"])
    args = p.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tar_path = Path(args.tar_path) if args.tar_path else out / "edges2shoes.tar.gz"
    if not tar_path.exists():
        print(f"downloading {URL} ...")
        urllib.request.urlretrieve(URL, tar_path)
    with tarfile.open(tar_path) as tar:
        tar.extractall(out)

    for split in args.splits:
        src = out / "edges2shoes" / split
        if src.exists():
            split_pairs(src, out if split == "train" else out / split)


if __name__ == "__main__":
    main()
