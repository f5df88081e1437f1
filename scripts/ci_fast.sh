#!/bin/sh
# Fast CI lane: every subsystem smoke-covered, compile-heavy tests skipped.
# ~4-5 min on a CPU box (the full suite is ~25 min; run it with plain
# `python -m pytest tests/ -q` before releases). Slow-marking policy:
# tests >14 s on the reference CPU box carry @pytest.mark.slow (durations
# measured round 2, tests/ -q --durations=40).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m "not slow" "$@"
