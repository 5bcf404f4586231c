"""Image grid saving / loading helpers (PIL-based, host-side only).

Replaces torchvision `utils.save_image` usage in the reference trainer
(`denoising_diffusion.py:1202`).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
from PIL import Image


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float NHWC/HWC -> uint8."""
    img = np.clip(np.asarray(img), 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int | None = None, padding: int = 2) -> np.ndarray:
    """Tile a (N, H, W, C) float [0,1] batch into one (GH, GW, C) uint8 grid."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    if nrow is None:
        nrow = int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.zeros(
        (ncol * (h + padding) + padding, nrow * (w + padding) + padding, c),
        dtype=np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, nrow)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return to_uint8(grid)


def save_image_grid(images, path, nrow: int | None = None) -> None:
    grid = make_grid(np.asarray(images), nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(path)


def log_txt_as_img(size, texts, font_size: int = 10) -> np.ndarray:
    """Render caption strings onto white tiles for TensorBoard logging —
    parity with the reference `ldm/util.py:17` (`log_txt_as_img`).
    Returns float [0,1] (N, H, W, 3)."""
    from PIL import ImageDraw

    w, h = (size, size) if isinstance(size, int) else size
    tiles = []
    chars_per_line = max(1, int(w / (font_size * 0.6)))
    for text in texts:
        img = Image.new("RGB", (w, h), color="white")
        draw = ImageDraw.Draw(img)
        lines = "\n".join(
            text[i : i + chars_per_line]
            for i in range(0, len(text), chars_per_line)
        )
        draw.text((2, 2), lines, fill="black")
        tiles.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(tiles)


def load_image(path, image_size=None, mode: str = "RGB") -> np.ndarray:
    """Load a single image as float32 [0,1] HWC."""
    img = Image.open(path)
    if img.mode != mode:
        img = img.convert(mode)
    if image_size is not None:
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        img = img.resize((image_size[1], image_size[0]), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr
