"""Parity tests: dsgan_tpu.ops conv/pool/norm primitives vs torch CPU.

torch is used ONLY as a test oracle (it is never imported by the framework).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dsgan_tpu import ops

RNG = np.random.default_rng(0)


def _nhwc(t):
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _to_hwio(w_oihw):
    # torch conv weight [O, I/g, kh, kw] -> HWIO [kh, kw, I/g, O]
    return np.ascontiguousarray(w_oihw.detach().numpy().transpose(2, 3, 1, 0))


@pytest.mark.parametrize(
    "cin,cout,k,s,p,groups,dil",
    [
        (3, 8, 3, 1, 1, 1, 1),
        (8, 8, 7, 1, 3, 8, 1),      # depthwise 7x7 (Block)
        (8, 8, 9, 1, 4, 8, 1),      # depthwise 9x9 (MidMLKA)
        (6, 4, 4, 2, 1, 1, 1),      # PatchGAN layer
        (4, 4, 5, 1, 10, 4, 5),     # dilated grouped (MLKA LKA branch)
        (3, 8, 1, 1, 0, 1, 1),      # pointwise
    ],
)
def test_conv2d_matches_torch(cin, cout, k, s, p, groups, dil):
    x = RNG.standard_normal((2, 16 + k * dil, 16 + k * dil, cin), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    wt = torch.randn(cout, cin // groups, k, k)
    bt = torch.randn(cout)
    ref = F.conv2d(xt, wt, bt, stride=s, padding=p, groups=groups, dilation=dil)
    got = ops.conv2d(
        jnp.asarray(x), jnp.asarray(_to_hwio(wt)), jnp.asarray(bt.numpy()),
        stride=s, padding=p, groups=groups, dilation=dil,
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,op",
    [
        (8, 4, 3, 2, 1, 1),   # MixConvNeXtML upSample
        (8, 4, 4, 2, 1, 0),   # UNet upconv
        (4, 6, 3, 2, 1, 1),
    ],
)
def test_conv_transpose2d_matches_torch(cin, cout, k, s, p, op):
    x = RNG.standard_normal((2, 12, 12, cin), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    wt = torch.randn(cin, cout, k, k)  # torch convT weight [in, out, kh, kw]
    bt = torch.randn(cout)
    ref = F.conv_transpose2d(xt, wt, bt, stride=s, padding=p, output_padding=op)
    # [in, out, kh, kw] -> HWIO [kh, kw, in, out], no flip (op flips internally)
    w_hwio = np.ascontiguousarray(wt.detach().numpy().transpose(2, 3, 0, 1))
    got = ops.conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(bt.numpy()),
        stride=s, padding=p, output_padding=op,
    )
    assert got.shape == _nhwc(ref).shape
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-4, atol=1e-4)


def test_max_pool2d_matches_torch():
    x = RNG.standard_normal((2, 16, 16, 5), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = F.max_pool2d(xt, 2)
    got = ops.max_pool2d(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cip", [True, False])
def test_avg_pool2d_matches_torch(cip):
    x = RNG.standard_normal((2, 15, 15, 4), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = F.avg_pool2d(xt, 3, stride=2, padding=1, count_include_pad=cip)
    got = ops.avg_pool2d(jnp.asarray(x), 3, stride=2, padding=1, count_include_pad=cip)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-6)


def test_avg_pool2d_odd_padding_matches_torch():
    # the ms_ssim downsample: kernel 2, padding = size % 2
    x = RNG.standard_normal((1, 11, 11, 3), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = F.avg_pool2d(xt, 2, padding=1)
    got = ops.avg_pool2d(jnp.asarray(x), 2, padding=(1, 1), count_include_pad=True)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-6)


def test_reflect_pad_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 3), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = F.pad(xt, (3, 3, 3, 3), mode="reflect")
    got = ops.reflect_pad2d(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-6, atol=1e-6)


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((3, 9, 7, 6), dtype=np.float32) * 4 + 1
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = F.instance_norm(xt)
    got = ops.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-4, atol=1e-5)


def test_instance_norm_grad_matches_torch():
    """The closed-form custom backward vs torch autograd of F.instance_norm
    (grad wrt input through a scalar loss)."""
    x = RNG.standard_normal((2, 8, 6, 5), dtype=np.float32) * 3 - 0.5
    t = RNG.standard_normal((2, 8, 6, 5), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    xt.requires_grad_(True)
    tt = torch.from_numpy(np.ascontiguousarray(t.transpose(0, 3, 1, 2)))
    ((F.instance_norm(xt) - tt) ** 2).mean().backward()
    ref = xt.grad.detach().numpy().transpose(0, 2, 3, 1)

    def loss(xj):
        return jnp.mean(jnp.square(ops.instance_norm(xj) - jnp.asarray(t)))

    got = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-6)


def test_instance_norm_bf16_close_to_f32():
    x = RNG.standard_normal((2, 16, 16, 8), dtype=np.float32) * 2
    yf = ops.instance_norm(jnp.asarray(x))
    yb = ops.instance_norm(jnp.asarray(x).astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(yb, np.float32), np.asarray(yf), rtol=0, atol=0.05
    )
    gf = jax.grad(lambda z: jnp.sum(jnp.square(ops.instance_norm(z))))(jnp.asarray(x))
    gb = jax.grad(
        lambda z: jnp.sum(jnp.square(ops.instance_norm(z)).astype(jnp.float32))
    )(jnp.asarray(x).astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(gb, np.float32), np.asarray(gf), rtol=0, atol=0.25
    )


def test_instance_norm_bf16_high_mean_low_variance():
    """Ill-conditioned regime |mean| >> sigma: the bf16 apply must subtract
    the mean in f32 so its only rounding is of the unit-scale OUTPUT —
    an all-bf16 x*rsig - mean*rsig form carries ~ulp(|mean*rsig|) absolute
    error, which at mean=100/std=1 is ~0.5 of the normalized output
    (ADVICE r2). Residual error here is the bf16 quantization of x itself."""
    x = (RNG.standard_normal((2, 16, 16, 4), dtype=np.float32) + 100.0).astype(
        np.float32
    )
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    # oracle: normalize the bf16-quantized input in f64-ish precision
    xq = np.asarray(xb, np.float32)
    mu = xq.mean(axis=(1, 2), keepdims=True)
    sd = np.sqrt(xq.var(axis=(1, 2), keepdims=True) + 1e-5)
    ref = (xq - mu) / sd
    got = np.asarray(ops.instance_norm(xb), np.float32)
    # one bf16 rounding of the O(1) output (~0.008) + stats f32 noise
    np.testing.assert_allclose(got, ref, rtol=0, atol=0.02)


def test_upsample_bilinear_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 3), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = F.interpolate(xt, size=(16, 16), mode="bilinear", align_corners=False)
    got = ops.upsample_bilinear(jnp.asarray(x), (16, 16))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-4, atol=1e-5)


def test_adaptive_pools_match_torch():
    x = RNG.standard_normal((2, 8, 8, 5), dtype=np.float32)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ops.adaptive_avg_pool(jnp.asarray(x))),
        _nhwc(F.adaptive_avg_pool2d(xt, 1)), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ops.adaptive_max_pool(jnp.asarray(x))),
        _nhwc(F.adaptive_max_pool2d(xt, 1)), rtol=1e-6, atol=1e-6,
    )


def test_instance_norm_bf16_high_mean_low_variance():
    """The ill-conditioned regime from the round-2 advisor finding: with
    |mean| >> sigma, a bf16-only normalize (x*rsig - mean*rsig) carries
    absolute error ~ulp(|mean*rsig|) that dominates the unit-scale
    output. The shipped form subtracts the mean in f32 and rounds the
    O(1) result once — pin it against a float64 oracle."""
    rng = np.random.default_rng(5)
    # per-channel mean ~100, std ~1 (e.g. unnormalized feature maps)
    base = rng.uniform(50, 150, (1, 1, 1, 8))
    x_bf16 = jnp.asarray(base + rng.standard_normal((2, 16, 16, 8)),
                         jnp.bfloat16)
    # oracle normalizes the SAME bf16-rounded values in float64 (the input
    # representation itself already costs ~ulp(100)~0.5; the finding is
    # about error the NORMALIZE path adds on top)
    x64 = np.asarray(x_bf16, np.float64)
    mean = x64.mean(axis=(1, 2), keepdims=True)
    std = x64.std(axis=(1, 2), keepdims=True)
    want = (x64 - mean) / np.sqrt(std**2 + 1e-5)

    got = np.asarray(ops.instance_norm(x_bf16), np.float32)
    # bf16 output resolution is ~2^-8 of the O(1) scale; the old bf16-only
    # path erred by up to ~0.5 here.
    np.testing.assert_allclose(got, want, atol=0.02)
