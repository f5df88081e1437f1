"""Pallas TPU kernels for the hot ops, each behind a runtime switch with
an XLA fallback and parity tests (tests/test_pallas.py).

Enable with env DSGAN_PALLAS=1 (default: on when running on TPU).
"""

import os

import jax


def pallas_enabled():
    """Default OFF: the axon remote-compile path takes ~4-5 minutes per
    Mosaic kernel and the persistent compilation cache does not capture
    remote compiles, so a model with ~20 kernel variants would spend an
    hour compiling. Set DSGAN_PALLAS=1 to opt in (parity is covered by
    tests/test_pallas.py in interpreter mode)."""
    return os.environ.get("DSGAN_PALLAS", "0") == "1"


from dsgan_tpu.pallas.dwconv import dwconv2d  # noqa: E402

__all__ = ["pallas_enabled", "dwconv2d"]
