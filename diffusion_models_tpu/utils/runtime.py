"""Process-level JAX runtime knobs shared by the CLI entry points.

`enable_compile_cache()` turns on the persistent compilation cache for
TPU-backed CLI runs (train/*.py, sampling*.py, scripts/*). With this
image's terminal-side compile (`PALLAS_AXON_REMOTE_COMPILE=1`) a cold
flagship/EDM2 train-step compile costs 10–20+ minutes of remote work and
shows ~zero local CPU; the persistent cache makes a relaunch (VM restart,
preemption, resume) skip every already-compiled program.

Deliberately NOT enabled for CPU: XLA:CPU AOT reload on this host trips a
machine-feature mismatch that can abort the process (see tests/conftest.py,
which runs the suite with the cache off for the same reason).
"""


def enable_compile_cache(cache_dir: str = "/tmp/dmt_jax_cache") -> None:
    import jax

    try:
        if jax.default_backend() != "cpu":
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass
