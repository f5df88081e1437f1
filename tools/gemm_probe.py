"""Hot-op probe for the MixConvNeXtML forward (the 115ms/step mystery).

Measures on the real chip, at batch 16 / 256^2 equivalents:
  * plain GEMMs at every encoder/decoder pointwise-MLP shape
  * the MLP chain (GEMM-gelu-GEMM) as XLA sees it inside the block
  * instance_norm at the hot shapes
  * depthwise convs at every Block's shape
  * ConvTranspose(3,2,1,1) vs conv(2x2->4C)+depth_to_space rewrite
  * the whole ConvNeXt block

Prints ms and TF/s (and GB/s for BW-bound ops) per line.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dsgan_tpu import ops

B = int(os.environ.get("GP_BATCH", "16"))
N_ITER = int(os.environ.get("GP_N", "30"))
DT = jnp.bfloat16


def timed(name, fn, *args, flops=0, bytes_=0):
    fn = jax.jit(fn)
    s = fn(*args)
    float(np.asarray(s))
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(N_ITER):
        acc = fn(*args) + acc * 1e-30
    float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / N_ITER
    line = f"{name:44s} {dt*1e3:8.2f} ms"
    if flops:
        line += f" {flops/dt/1e12:7.1f} TF/s"
    if bytes_:
        line += f" {bytes_/dt/1e9:7.0f} GB/s"
    print(line, flush=True)
    return dt


def rnd(*shape):
    return jnp.asarray(
        np.random.default_rng(0).normal(0, 1, shape).astype(np.float32)
    ).astype(DT)


def main():
    print(f"batch={B} dtype=bf16 iters={N_ITER}")

    # ---- 1. plain GEMMs at block-MLP shapes -----------------------------
    # (dim -> 4dim -> plans) at each block's resolution
    shapes = [
        # name, H, dim, hidden, plans
        ("c1 MLP 256^2 3->12->64", 256, 3, 12, 64),
        ("c2 MLP 128^2 64->256->128", 128, 64, 256, 128),
        ("c3 MLP 64^2 128->512->256", 64, 128, 512, 256),
        ("c4 MLP 32^2 256->1024->512", 32, 256, 1024, 512),
        ("c5 MLP 16^2 512->2048->1024", 16, 512, 2048, 1024),
        ("uc1 MLP 32^2 1024->4096->512", 32, 1024, 4096, 512),
        ("uc2 MLP 64^2 512->2048->256", 64, 512, 2048, 256),
        ("uc3 MLP 128^2 256->1024->128", 128, 256, 1024, 128),
        ("uc4 MLP 256^2 128->512->64", 256, 128, 512, 64),
    ]
    for name, h, dim, hid, plans in shapes:
        m = B * h * h
        x = rnd(m, dim)
        w1, w2 = rnd(dim, hid), rnd(hid, plans)
        fl = 2 * m * (dim * hid + hid * plans)

        def mlp(x, w1, w2):
            return jnp.sum((jax.nn.gelu(x @ w1, approximate=True) @ w2).astype(jnp.float32))

        timed(name, mlp, x, w1, w2, flops=fl)

    # single GEMM reference points
    for mk, k, n in ((256 * 256 * B, 128, 512), (256 * 256 * B, 512, 64), (128 * 128 * B, 256, 1024)):
        x, w = rnd(mk, k), rnd(k, n)
        timed(
            f"GEMM ({mk//1024}k x {k}) @ ({k} x {n})",
            lambda x, w: jnp.sum((x @ w).astype(jnp.float32)),
            x, w, flops=2 * mk * k * n,
        )

    # NHWC layout vs flattened-M GEMM
    x4 = rnd(B, 256, 256, 128)
    w1, w2 = rnd(128, 512), rnd(512, 64)

    def mlp_nhwc(x, w1, w2):
        return jnp.sum((jax.nn.gelu(x @ w1, approximate=True) @ w2).astype(jnp.float32))

    timed("uc4 MLP as NHWC tensor (no reshape)", mlp_nhwc, x4, w1, w2,
          flops=2 * B * 256 * 256 * (128 * 512 + 512 * 64))

    # erf vs tanh in the chain
    def mlp_erf(x, w1, w2):
        return jnp.sum((jax.nn.gelu(x @ w1, approximate=False) @ w2).astype(jnp.float32))

    timed("uc4 MLP erf-GELU (flat)", mlp_erf, rnd(B * 256 * 256, 128), w1, w2,
          flops=2 * B * 256 * 256 * (128 * 512 + 512 * 64))

    # ---- 2. instance norm -------------------------------------------------
    for h, c in ((256, 64), (256, 128), (128, 256), (64, 512)):
        x = rnd(B, h, h, c)
        nbytes = 2 * x.size * 2  # read + write, bf16
        timed(f"instance_norm ({h}^2 x {c})",
              lambda x: jnp.sum(ops.instance_norm(x).astype(jnp.float32)), x,
              bytes_=nbytes)

    # ---- 3. depthwise convs at Block shapes --------------------------------
    dwshapes = [
        ("dw7 c1 256^2 x3", 256, 3, 7),
        ("dw7 c2 128^2 x64", 128, 64, 7),
        ("dw7 c3 64^2 x128", 64, 128, 7),
        ("dw7 c4 32^2 x256", 32, 256, 7),
        ("dw7 c5 16^2 x512", 16, 512, 7),
        ("dw7 uc1 32^2 x1024", 32, 1024, 7),
        ("dw7 uc2 64^2 x512", 64, 512, 7),
        ("dw7 uc3 128^2 x256", 128, 256, 7),
        ("dw7 uc4 256^2 x128", 256, 128, 7),
        ("dw9 mid32 128^2 x32", 128, 32, 9),
        ("dw9 mid64 64^2 x64", 64, 64, 9),
        ("dw9 mid128 32^2 x128", 32, 128, 9),
        ("dw9 mid256 16^2 x256", 16, 256, 9),
        ("dw9 upc2 64^2 x64", 64, 64, 9),
        ("dw9 upc3 128^2 x64", 128, 64, 9),
    ]
    for name, h, c, k in dwshapes:
        x = rnd(B, h, h, c)
        w = rnd(k, k, 1, c)
        bvec = rnd(c)
        fl = 2 * B * h * h * c * k * k
        timed(name,
              lambda x, w, bvec: jnp.sum(
                  ops.conv2d(x, w, bvec, stride=1, padding=k // 2, groups=c).astype(jnp.float32)),
              x, w, bvec, flops=fl)

    # ---- 4. ConvTranspose vs conv + depth_to_space -------------------------
    for h, cin, cout in ((32, 512, 512), (64, 256, 256), (128, 128, 128), (256, 64, 64)):
        x = rnd(B, h, h, cin)
        wt = rnd(3, 3, cin, cout)
        bt = rnd(cout)
        fl = 2 * B * (2 * h) * (2 * h) * cin * cout * 9 / 4  # effective taps

        timed(f"ConvT3x3s2 {h}^2 {cin}->{cout}",
              lambda x, wt, bt: jnp.sum(
                  ops.conv_transpose2d(x, wt, bt, stride=2, padding=1, output_padding=1)
                  .astype(jnp.float32)),
              x, wt, bt, flops=fl)

        w4 = rnd(2, 2, cin, cout * 4)
        b4 = rnd(cout * 4)

        def convd2s(x, w4, b4):
            y = ops.conv2d(x, w4, b4, stride=1, padding=1)  # (B,h+1,h+1,4c)
            y = y[:, :-1, :-1, :]
            n, hh, ww, c4 = y.shape
            y = y.reshape(n, hh, ww, 2, 2, c4 // 4)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * 2, ww * 2, c4 // 4)
            return jnp.sum(y.astype(jnp.float32))

        timed(f"conv2x2+d2s {h}^2 {cin}->{cout}", convd2s, x, w4, b4,
              flops=2 * B * h * h * cin * cout * 4 * 4)

    # ---- 5. whole ConvNeXt block (XLA) --------------------------------------
    from dsgan_tpu.models.mixconvnext import ConvNeXtBlock

    for name, h, dim, plans in (("uc4 Block 256^2 128->64", 256, 128, 64),
                                ("uc3 Block 128^2 256->128", 128, 256, 128),
                                ("c2 Block 128^2 64->128", 128, 64, 128)):
        blk = ConvNeXtBlock(plans, dtype=DT)
        x = rnd(B, h, h, dim)
        params = blk.init(jax.random.PRNGKey(0), x)
        m = B * h * h
        fl = 2 * m * (dim * 4 * dim + 4 * dim * plans + dim * plans + dim * 49)
        timed(name,
              lambda p, x: jnp.sum(blk.apply(p, x).astype(jnp.float32)),
              params, x, flops=fl)

    # ---- 6. maxpool ---------------------------------------------------------
    x = rnd(B, 256, 256, 64)
    timed("maxpool2x2 256^2 x64",
          lambda x: jnp.sum(ops.max_pool2d(x, 2).astype(jnp.float32)), x,
          bytes_=x.size * 2 + x.size // 2)


if __name__ == "__main__":
    main()
