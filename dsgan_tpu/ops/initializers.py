"""Weight initializers matching torch's init schemes at gain=0.02
(reference DSGAN/models/networks.py:49-70: normal / xavier / kaiming /
orthogonal applied to every Conv and Linear weight, biases zeroed).

Flax kernels are HWIO `[kh, kw, in, out]`; fan_in = kh*kw*in matches
torch's fan for OIHW conv weights, so the distributions line up exactly.
"""

import jax
import jax.numpy as jnp


def _fans(shape):
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def make_initializer(init_type="normal", gain=0.02):
    """Return a flax-style init fn(key, shape, dtype) for kernel weights."""

    def normal(key, shape, dtype=jnp.float32):
        return gain * jax.random.normal(key, shape, dtype)

    def xavier(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    def kaiming(key, shape, dtype=jnp.float32):
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)
        fan_in, _ = _fans(shape)
        std = (2.0 / fan_in) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    def orthogonal(key, shape, dtype=jnp.float32):
        flat = (int(jnp.prod(jnp.asarray(shape[:-1]))), shape[-1])
        n, m = max(flat), min(flat)
        a = jax.random.normal(key, (n, m), jnp.float32)
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))
        if flat[0] < flat[1]:
            q = q.T
        return (gain * q.reshape(shape)).astype(dtype)

    table = {
        "normal": normal,
        "xavier": xavier,
        "kaiming": kaiming,
        "orthogonal": orthogonal,
    }
    if init_type not in table:
        raise NotImplementedError(f"initialization method [{init_type}] is not implemented")
    return table[init_type]
