"""Collect every committed `results/*/rescore.json` into one markdown
table (the measured-families summary in README.md and the round notes).
Keeps the headline table honest: it is generated from the committed
measurement artifacts, not hand-maintained — and it rewrites the committed
copies in place between `<!-- RESULTS_TABLE -->` / `<!-- /RESULTS_TABLE -->`
markers so they cannot drift from the artifacts.

    python scripts/results_table.py            # rewrite marked files + print
    python scripts/results_table.py --stdout   # print only
"""

import json
import sys
from pathlib import Path

# display order + human labels for the measured families
FAMILIES = [
    ("ddpm_natural32", "pixel DDPM (flagship, 100k)"),
    ("edm_natural32", "EDM / elucidated (20k)"),
    # the original 100k run's checkpoint was wiped by a VM restart (its
    # committed trail lives in results/edm2_karras_natural32/); the round-5
    # retrain reproduces it with durable in-repo milestones
    ("edm2_karras_natural32_100k", "EDM2 / Karras-MP (100k retrain)"),
    ("edm2_karras_natural32_30k",
     "EDM2 / Karras-MP (30k — undertrained budget point)"),
    ("ddpm_gray2color", "image-conditional DDPM (20k)"),
    ("ddpm_text_colors", "text-conditional DDPM (20k)"),
    ("cfg_color_classes", "CFG class-conditional (20k)"),
    ("ldm_natural32", "VQ-GAN → LDM (20k)"),
    ("ldm_gray2color", "dual-VAE image-cond LDM (20k)"),
    ("ldm_text_colors", "text-conditional LDM (20k)"),
]

# files whose committed table is regenerated in place
MARKED_FILES = ["README.md", "docs/ROUND3_NOTES.md", "docs/ROUND4_NOTES.md"]

BEGIN, END = "<!-- RESULTS_TABLE -->", "<!-- /RESULTS_TABLE -->"


def build_table(root: Path) -> str:
    rows = []
    protocols = set()
    for folder, label in FAMILIES:
        f = root / folder / "rescore.json"
        if not f.exists():
            rows.append((label, folder, None))
            continue
        r = json.loads(f.read_text())
        protocols.add((r["n"], len(r["seeds"])))
        rows.append((label, folder, r))

    # the column header states the protocol — derive it from the artifacts
    # and fail loudly on a mix, instead of silently mislabeling a future
    # rescore run at a different n / seed count
    if len(protocols) > 1:
        raise SystemExit(f"mixed rescore protocols in artifacts: {protocols}")
    n, n_seeds = protocols.pop() if protocols else (5000, 3)

    # He-init features: the zero-egress image has no pretrained Inception,
    # so FID is relative (trend/comparison within this repo), not
    # literature-comparable — label the column so the table is
    # self-contained even when quoted without the surrounding prose.
    # IS is suppressed entirely: with He-init logits the class posterior is
    # near-uniform, so IS ≈ 1.0 for every model and, unlike He-init FID,
    # carries no trend signal (std ≈ 1e-4 across seeds). The plumbing and
    # tests stay live; the column activates when real Inception weights are
    # dropped in (docs/WEIGHTS.md).
    lines = [
        f"| family | FID (He-init features, relative only; n={n} × "
        f"{n_seeds} seeds) | milestone | results |",
        "|---|---|---|---|",
    ]
    for label, folder, r in rows:
        if r is None:
            lines.append(
                f"| {label} | — (no rescore.json) | — |"
                f" `results/{folder}/` |")
            continue
        fid = f"**{r['fid_mean']:.2f} ± {r['fid_std']:.2f}**"
        lines.append(f"| {label} | {fid} | {r['milestone']} |"
                     f" `results/{folder}/` |")
    lines.append(
        "\nIS is recorded in each `rescore.json` but not tabulated: with "
        "He-init Inception logits IS ≈ 1.0 by construction for every model "
        "(no signal, unlike He-init FID which preserves trend). The IS "
        "column activates when real Inception weights are supplied "
        "(`docs/WEIGHTS.md`).")
    return "\n".join(lines)


def rewrite_in_place(path: Path, table: str) -> bool:
    text = path.read_text()
    if BEGIN not in text or END not in text:
        return False
    head, rest = text.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    path.write_text(f"{head}{BEGIN}\n{table}\n{END}{tail}")
    return True


def main():
    repo = Path(__file__).resolve().parents[1]
    table = build_table(repo / "results")
    print(table)
    if "--stdout" in sys.argv:
        return
    for rel in MARKED_FILES:
        p = repo / rel
        if p.exists() and rewrite_in_place(p, table):
            print(f"rewrote table in {rel}", file=sys.stderr)


if __name__ == "__main__":
    main()
