#!/bin/bash
# The slow test lane: long-running integration/parity tests excluded from
# the default fast suite (pytest.ini `addopts = -m "not slow"`). Run this
# once per round — the fast lane is the per-change loop, this is the
# per-round coverage closure. Everything here is still required to pass.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m slow -q --durations=20 "$@"
