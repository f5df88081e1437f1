"""Pallas TPU kernels for the hot ops, each behind a runtime switch with
an XLA fallback and parity tests (tests/test_pallas.py).

Enable with env DSGAN_PALLAS=1 (default: on when running on TPU).
"""

import os

import jax


def pallas_enabled():
    flag = os.environ.get("DSGAN_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


from dsgan_tpu.pallas.dwconv import dwconv2d  # noqa: E402

__all__ = ["pallas_enabled", "dwconv2d"]
