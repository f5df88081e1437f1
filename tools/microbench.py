"""Op-level microbenchmarks on the real TPU — identifies which primitives
the XLA lowering handles poorly (candidates for Pallas kernels).

Timing method: chain N dependent iterations of a jitted fn and fetch one
scalar at the end (the axon relay makes block_until_ready unreliable and
adds ~30ms RTT per synchronous fetch; chaining amortizes it away).
"""

import time

import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from dsgan_tpu import ops


def timed(name, f, x, n=30, flops=None, bytes_=None):
    f = jax.jit(f)
    y = f(x)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + sync

    def chain(x):
        return f(x) * 0.999 + x * 0.001 if x.shape == y.shape else f(x)

    # if shapes differ, fall back to re-running on same input (no chain)
    same = (y.shape == x.shape and y.dtype == x.dtype)
    t0 = time.perf_counter()
    if same:
        z = x
        for _ in range(n):
            z = f(z)
        float(jnp.sum(z.astype(jnp.float32)))
    else:
        zs = None
        for _ in range(n):
            zs = f(x)
        float(jnp.sum(zs.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    line = f"{name:48s} {dt*1e3:8.3f} ms"
    if flops:
        line += f"  {flops/dt/1e12:6.1f} TF/s"
    if bytes_:
        line += f"  {bytes_/dt/1e9:6.0f} GB/s"
    print(line)
    return dt


def main():
    B, H, W = 8, 256, 256
    rng = np.random.default_rng(0)

    for C, k in [(64, 7), (128, 7), (32, 3), (32, 9)]:
        h = H if C in (64, 32) else H // 2
        x = jnp.asarray(rng.standard_normal((B, h, h, C)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, 1, C)).astype(np.float32)).astype(jnp.bfloat16)
        flops = 2 * B * h * h * C * k * k
        byt = 2 * B * h * h * C * 2
        timed(f"dwconv {k}x{k} C={C} @{h}", lambda x, w=w, k=k, C=C: ops.conv2d(x, w, stride=1, padding=k // 2, groups=C), x, flops=flops, bytes_=byt)

    # pointwise MLP (Block's pwconv pair) C->4C->C at 256^2
    for C in (64, 128):
        h = H if C == 64 else H // 2
        x = jnp.asarray(rng.standard_normal((B, h, h, C)).astype(np.float32)).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((C, 4 * C)).astype(np.float32)).astype(jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((4 * C, C)).astype(np.float32)).astype(jnp.bfloat16)
        flops = 2 * B * h * h * (C * 4 * C + 4 * C * C)
        timed(f"pw-MLP {C}->4{C}->{C} @{h}", lambda x, w1=w1, w2=w2: jax.nn.gelu(x @ w1, approximate=False) @ w2, x, flops=flops)

    # instance norm
    for C in (64, 1024):
        h = H if C == 64 else 16
        x = jnp.asarray(rng.standard_normal((B, h, h, C)).astype(np.float32)).astype(jnp.bfloat16)
        byt = 2 * B * h * h * C * 2
        timed(f"instance_norm C={C} @{h}", ops.instance_norm, x, bytes_=byt)

    # 3x3 conv 64->64 at 256^2 (VGG-style, MXU reference point)
    x = jnp.asarray(rng.standard_normal((B, H, W, 64)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32)).astype(jnp.bfloat16)
    flops = 2 * B * H * W * 64 * 64 * 9
    timed("conv3x3 64->64 @256", lambda x, w=w: ops.conv2d(x, w, stride=1, padding=1), x, flops=flops)

    # 3x3 conv 3->64 (VGG first layer, lane-padding pathology check)
    x3 = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32)).astype(jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 64)).astype(np.float32)).astype(jnp.bfloat16)
    flops = 2 * B * H * W * 3 * 64 * 9
    timed("conv3x3 3->64 @256 (first layer)", lambda x, w=w3: ops.conv2d(x, w, stride=1, padding=1), x3, flops=flops)

    # maxpool + convtranspose
    x = jnp.asarray(rng.standard_normal((B, H, W, 64)).astype(np.float32)).astype(jnp.bfloat16)
    timed("maxpool2 C=64 @256", lambda x: ops.max_pool2d(x, 2), x, bytes_=2 * B * H * W * 64 * 2)
    xt = jnp.asarray(rng.standard_normal((B, 128, 128, 128)).astype(np.float32)).astype(jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 128, 64)).astype(np.float32)).astype(jnp.bfloat16)
    flops = 2 * B * 256 * 256 * 128 * 64 * 9 // 4
    timed("convT3x3 s2 128->64 @128->256", lambda x, w=wt: ops.conv_transpose2d(x, w, stride=2, padding=1, output_padding=1), xt, flops=flops)

    # SSIM loss at 256^2
    a = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    timed("ssim(256^2, data_range=1)", lambda a: ops.ssim(a, a * 0.9, data_range=1) + 0 * jnp.sum(a), a)


if __name__ == "__main__":
    main()
