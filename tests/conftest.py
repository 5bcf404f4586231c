"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the sharding tests exercise
the identical pjit/NamedSharding code paths on 8 fake CPU devices.

Note: the environment's sitecustomize imports jax and registers the `axon`
TPU plugin in every interpreter, so JAX_PLATFORMS env tweaks are too late —
the platform must be forced via jax.config before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# XLA:CPU AOT reload on this host trips a machine-feature mismatch
# (+prefer-no-scatter/-gather) that can abort the process.

# XLA:CPU compile time dominates the suite on this 1-core host (most tests
# compile a small U-Net program and run it once). Skip the expensive HLO
# optimization passes — the programs are tiny, correctness is what's under
# test, and numerics if anything get MORE literal. DMT_TEST_FULL_OPT=1
# restores full optimization (e.g. to rule the fast path out when
# debugging a numeric mismatch).
if os.environ.get("DMT_TEST_FULL_OPT", "0") != "1":
    jax.config.update("jax_disable_most_optimizations", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_fused_mesh():
    """The fused-kernel mesh registry is process-global (set by every
    Trainer construction); reset it around each test so a trainer built in
    one test cannot re-route kernel calls in another."""
    from diffusion_models_tpu.ops.pallas.linear_attn_block import (
        set_fused_mesh,
    )

    set_fused_mesh(None)
    yield
    set_fused_mesh(None)
