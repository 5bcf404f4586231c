"""The driver contract: bench.py prints ONE parseable JSON line with the
required keys; __graft_entry__ exposes entry() and dryrun_multichip."""

import json


def test_bench_module_constants():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "benchmod", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main")
    assert mod.A100_EST_SAMPLES_PER_SEC > 0


def test_graft_entry_surface():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graftmod",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)
