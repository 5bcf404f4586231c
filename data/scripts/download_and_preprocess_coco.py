"""COCO (captions) download + per-image caption export.

Output-layout parity with the reference
`data/scripts/download_and_preprocess_coco.py:52-87`:
`data/coco/{target/<image_id>.jpg, condition/<image_id>.txt}` with one
caption per line per text file, ready for
`utils/clip_embeddings.precompute_text_embeddings`.
"""

import argparse
import json
import shutil
import urllib.request
import zipfile
from collections import defaultdict
from pathlib import Path

ANN_URL = "http://images.cocodataset.org/annotations/annotations_trainval2017.zip"
VAL_URL = "http://images.cocodataset.org/zips/val2017.zip"


def export_captions(ann_file: Path, images_dir: Path, out_root: Path):
    cond_dir = out_root / "condition"
    target_dir = out_root / "target"
    cond_dir.mkdir(parents=True, exist_ok=True)
    target_dir.mkdir(parents=True, exist_ok=True)

    with open(ann_file) as f:
        ann = json.load(f)
    captions = defaultdict(list)
    for a in ann["annotations"]:
        captions[a["image_id"]].append(a["caption"].strip())

    count = 0
    for img in ann["images"]:
        src = images_dir / img["file_name"]
        if not src.exists():
            continue
        stem = Path(img["file_name"]).stem
        shutil.copyfile(src, target_dir / img["file_name"])
        caps = captions.get(img["id"], [])
        if caps:
            (cond_dir / f"{stem}.txt").write_text("\n".join(caps))
        count += 1
    print(f"exported {count} images + captions to {out_root}")


def _fetch(url: str, dest: Path):
    if not dest.exists():
        print(f"downloading {url} ...")
        urllib.request.urlretrieve(url, dest)
    with zipfile.ZipFile(dest) as z:
        z.extractall(dest.parent)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", type=str, default="data/coco")
    p.add_argument("--images_dir", type=str, default=None,
                   help="pre-downloaded images folder (skips image download)")
    p.add_argument("--annotations", type=str, default=None,
                   help="pre-downloaded captions_*.json (skips ann download)")
    args = p.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if args.annotations:
        ann_file = Path(args.annotations)
    else:
        _fetch(ANN_URL, out / "annotations_trainval2017.zip")
        ann_file = out / "annotations" / "captions_val2017.json"

    if args.images_dir:
        images_dir = Path(args.images_dir)
    else:
        _fetch(VAL_URL, out / "val2017.zip")
        images_dir = out / "val2017"

    export_captions(ann_file, images_dir, out)


if __name__ == "__main__":
    main()
