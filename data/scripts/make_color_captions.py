"""Build a zero-egress text-conditional dataset: color captions.

Each natural patch gets a caption describing its dominant hue and
brightness ("a bright green patch"), written to `condition/<id>.txt`,
with the image under `target/<id>.png` — the layout
`TextConditionalDataset` consumes (reference `train/utils/data.py`
caption-folder convention). Since CLIP weights cannot enter this image
(zero egress), captions are embedded with a deterministic hash-seeded
512-d unit vector per caption string (`text_embeddings.pkl`, same pickle
schema as `utils/clip_embeddings.py`). The embedding carries no semantics
beyond identity — which is exactly what makes the conditioning measurable:
a model sampled with the "green" embedding should produce green-dominant
patches only if cross-attention conditioning actually works.

    python data/scripts/make_color_captions.py \
        --src data/natural_patches_32/train_images \
        --out data/color_captions_32 --n 20000
"""

import argparse
import hashlib
import pickle
from pathlib import Path

import numpy as np
from PIL import Image

HUES = ["red", "green", "blue", "gray"]


def caption_for(arr: np.ndarray) -> str:
    mean = arr.mean(axis=(0, 1))  # RGB
    brightness = "bright" if mean.mean() > 110 else "dark"
    spread = mean.max() - mean.min()
    if spread < 12:
        hue = "gray"
    else:
        hue = ["red", "green", "blue"][int(mean.argmax())]
    return f"a {brightness} {hue} patch"


def embed(caption: str, dim: int = 512) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(caption.encode()).digest()[:8], "little")
    v = np.random.RandomState(seed % (2**32)).normal(size=(dim,))
    return (v / np.linalg.norm(v)).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="data/natural_patches_32/train_images")
    p.add_argument("--out", default="data/color_captions_32")
    p.add_argument("--n", type=int, default=20000)
    args = p.parse_args()

    src = sorted(Path(args.src).glob("*.png"))[: args.n]
    out = Path(args.out)
    (out / "condition").mkdir(parents=True, exist_ok=True)
    (out / "target").mkdir(parents=True, exist_ok=True)

    embeddings = {}
    counts = {}
    for i, path in enumerate(src):
        img = Image.open(path).convert("RGB")
        arr = np.asarray(img, np.float32)
        cap = caption_for(arr)
        counts[cap] = counts.get(cap, 0) + 1
        stem = f"{i:06d}"
        (out / "condition" / f"{stem}.txt").write_text(cap + "\n")
        img.save(out / "target" / f"{stem}.png")
        embeddings[stem] = {
            "captions": [cap],
            "embeddings": embed(cap)[None, :],
        }
    with open(out / "text_embeddings.pkl", "wb") as f:
        pickle.dump(embeddings, f)
    print(f"wrote {len(src)} captioned pairs; caption counts: {counts}")


if __name__ == "__main__":
    main()
