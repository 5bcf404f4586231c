"""Collect every committed `results/*/rescore.json` into one markdown
table (the nine-measured-families summary used in docs/ROUND3_NOTES.md
and README.md). Keeps the headline table honest: it is generated from
the committed measurement artifacts, not hand-maintained.

    python scripts/results_table.py
"""

import json
from pathlib import Path

# display order + human labels for the measured families
FAMILIES = [
    ("ddpm_natural32", "pixel DDPM (flagship, 100k)"),
    ("edm_natural32", "EDM / elucidated (20k)"),
    ("edm2_karras_natural32", "EDM2 / Karras-MP (100k)"),
    ("edm2_karras_natural32_30k", "EDM2 / Karras-MP (30k rerun)"),
    ("ddpm_gray2color", "image-conditional DDPM (20k)"),
    ("ddpm_text_colors", "text-conditional DDPM (20k)"),
    ("cfg_color_classes", "CFG class-conditional (20k)"),
    ("ldm_natural32", "VQ-GAN → LDM (20k)"),
    ("ldm_gray2color", "dual-VAE image-cond LDM (20k)"),
    ("ldm_text_colors", "text-conditional LDM (20k)"),
]


def main():
    root = Path(__file__).resolve().parents[1] / "results"
    rows = []
    for folder, label in FAMILIES:
        f = root / folder / "rescore.json"
        if not f.exists():
            rows.append((label, folder, None))
            continue
        r = json.loads(f.read_text())
        rows.append((label, folder, r))

    print("| family | FID (n=5000 × 3 seeds) | milestone | results |")
    print("|---|---|---|---|")
    for label, folder, r in rows:
        if r is None:
            print(f"| {label} | — (no rescore.json) | — |"
                  f" `results/{folder}/` |")
            continue
        mean, std = r["fid_mean"], r["fid_std"]
        print(f"| {label} | **{mean:.2f} ± {std:.2f}** |"
              f" {r['milestone']} | `results/{folder}/` |")


if __name__ == "__main__":
    main()
