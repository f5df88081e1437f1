"""Pallas TPU kernels for the hot ops, each behind a runtime switch with
an XLA fallback and parity tests (tests/test_pallas.py).

Defaults: ON when running on a TPU backend, OFF elsewhere (the CPU test
suite exercises the kernels through interpreter mode explicitly). The
round-1 blocker — ~5 min Mosaic compiles through the axon relay with no
caching — is gone: the persistent compilation cache
(dsgan_tpu/__init__.py) now captures Mosaic kernels too (block_core at
the 256^2 decoder shape compiles in ~1 s warm, measured round 2).

Env switches:
  DSGAN_PALLAS=0/1            force kernels off/on (default: auto by backend)
  DSGAN_PALLAS_INTERPRET=1    run kernels in interpreter mode (CPU tests)
"""

import os

import jax


def pallas_enabled():
    """True when Pallas kernels should be used (TPU, or forced via env)."""
    env = os.environ.get("DSGAN_PALLAS")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never raises today
        return False


def pallas_interpret():
    """True to run kernels through the Pallas interpreter (CPU testing)."""
    return os.environ.get("DSGAN_PALLAS_INTERPRET", "0") == "1"


from dsgan_tpu.pallas.block_core import (  # noqa: E402
    block_core, block_core_fits, block_core_in,
    block_core2_fits, block_core2_in,
)

__all__ = [
    "pallas_enabled",
    "pallas_interpret",
    "block_core",
    "block_core_fits",
    "block_core_in",
    "block_core2_fits",
    "block_core2_in",
]
