"""Persistent XLA compilation cache, on by default for training/sampling.

TPU compiles of the fused train step / sampler scans cost minutes; the
persistent cache makes every repeat CLI invocation (resume, sweep,
bench) start in seconds. The reference has no analogue (torch eager);
this is a TPU-native QoL default.

Env overrides: `DMT_COMPILE_CACHE=0` disables; `DMT_COMPILE_CACHE_DIR`
relocates (default `~/.cache/dmt_jax_cache`).

NOTE: not enabled under the CPU test mesh — XLA:CPU AOT reload on some
hosts trips a machine-feature mismatch abort (see tests/conftest.py).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotently enable the persistent compilation cache (TPU/GPU only)."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("DMT_COMPILE_CACHE", "1") == "0":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
        cache_dir = os.environ.get(
            "DMT_COMPILE_CACHE_DIR",
            str(Path.home() / ".cache" / "dmt_jax_cache"),
        )
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        return True
    except Exception:
        return False
