"""Metric/observability writer.

Covers the reference's TensorBoard surface (`denoising_diffusion.py:1158,
1189,1206,1225,1231`: Train/Loss scalars, sample-grid images, Eval/FID,
Eval/IS) with a tensorboardX backend, plus an always-on JSONL mirror so runs
remain inspectable without TensorBoard.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


class MetricWriter:
    def __init__(self, logdir, use_tensorboard: bool = True):
        # multi-host: only process 0 writes (every process constructs the
        # writer; the others are no-ops) — the `accelerator.is_main_process`
        # gating of the reference (`denoising_diffusion.py:1155-1158`).
        # Import lazily so the module stays usable without jax.
        try:
            import jax

            self.active = jax.process_index() == 0
        except Exception:
            self.active = True
        self.logdir = Path(logdir)
        self._jsonl = None
        self._tb = None
        if not self.active:
            return
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a")
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.logdir))
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value, step: int):
        if not self.active:
            return
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step), "t": time.time()})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        """img_hwc: float [0,1] or uint8 HWC."""
        if not self.active:
            return
        if self._tb is not None:
            img = np.asarray(img_hwc)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def text(self, tag: str, text: str, step: int):
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
