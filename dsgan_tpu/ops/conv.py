"""NHWC convolution / pooling primitives with torch-compatible geometry.

These are thin functional wrappers over ``lax.conv_general_dilated`` /
``lax.reduce_window`` used by the flax modules in ``dsgan_tpu.models``.
They exist so that (a) every layer in the framework shares one audited
implementation of the geometry rules (padding, output_padding, pooling
edge handling) that the reference's recipes depend on, and (b) imported
PyTorch checkpoints evaluate identically.

Weight layout is HWIO (`[kh, kw, in_ch/groups, out_ch]`), the XLA-native
filter layout. ``dsgan_tpu.utils.pth_convert`` maps torch's OIHW onto it.

Reference geometry being matched (behavior, not code):
  * Conv2d(k, s, p): cross-correlation, zero padding p.
  * ConvTranspose2d(k, s, p, op): the gradient-of-conv operator, i.e.
    input dilation by s, kernel spatially flipped with in/out swapped,
    effective padding (k-1-p, k-1-p+op)  (used at e.g. reference
    DSGAN/models/model/MixConvNeXtML.py:53 with k=3,s=2,p=1,op=1).
  * MaxPool2d(2) window 2 stride 2 (MixConvNeXtML.py:71).
  * AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
    (networks.py:675 MultiscaleDiscriminator pyramid).
  * AvgPool2d(2, padding=s%2) with count_include_pad=True (MS_SSIM.py:215).
"""


import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, *, stride=1, padding=0, groups=1, dilation=1):
    """torch-style Conv2d on NHWC input, HWIO weight."""
    if isinstance(stride, int):
        stride = (stride, stride)
    padding = _norm_pad(padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    # NOTE: no preferred_element_type here — with bf16 operands it breaks
    # reverse-mode AD (the conv transpose rule would mix an f32 cotangent
    # with bf16 weights), and the TPU MXU accumulates bf16 convs in f32
    # regardless.
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(x, w, b=None, *, stride=2, padding=0, output_padding=0):
    """torch-style ConvTranspose2d on NHWC input.

    ``w`` is HWIO with I = input channels of `x` and O = output channels
    (i.e. already in the forward-of-this-op orientation; the pth converter
    handles torch's [in, out, kh, kw] layout and performs NO flip — the
    spatial flip happens here, matching the transpose-conv definition).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    kh, kw = w.shape[0], w.shape[1]
    pads = (
        (kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
        (kw - 1 - padding[1], kw - 1 - padding[1] + output_padding[1]),
    )
    y = lax.conv_general_dilated(
        x,
        jnp.flip(w, (0, 1)),
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_DIMNUMS,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _norm_pad(padding):
    """Normalize int / (ph, pw) / ((t,b),(l,r)) paddings to pair-of-pairs."""
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    if len(padding) == 2 and all(isinstance(p, int) for p in padding):
        return ((padding[0], padding[0]), (padding[1], padding[1]))
    return tuple(tuple(p) for p in padding)


def max_pool2d(x, window=2, stride=None, padding=0):
    """torch-style MaxPool2d on NHWC.

    NOTE: reshape-max and mask-multiply-backward variants were benchmarked
    for the non-overlapping case and both LOST to XLA's reduce_window +
    select-and-scatter on v5e (92.2 -> 88.7 / 81.8 img/s full-step); keep
    the straightforward lowering."""
    if stride is None:
        stride = window
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    padding = _norm_pad(padding)
    # NOTE: init must be a scalar literal so XLA pattern-matches this to the
    # reduce_window_max primitive (which has a VJP); an array init produces
    # a generic reduce_window that cannot be reverse-differentiated.
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), *padding, (0, 0)),
    )


def dw_conv_s2d(x, kflat, b, k, f):
    """Depthwise k x k 'same' conv at NARROW channel counts, computed as a
    space-to-depth DENSE conv — exactly the same sums, MXU-friendly.

    Narrow-channel depthwise convs are the worst case for the TPU: the
    grouped lowering is VPU-tap-bound AND lane-starved (C=32 runs at
    ~1.1 TF/s effective vs ~4 TF/s at C=128; C=3 is 40x worse still), and
    a diagonal-masked dense conv at the SAME width doesn't help because
    the MXU output side is equally lane-starved (measured neutral at 32,
    tools/dwbwd_probe.py / tools/midmlka_probe.py). Packing f x f pixels
    into channels gives a dense conv at f^2*C channels and full (or much
    fuller) lanes:

        source row = y0 - k//2 + u,  y0 = f*I + p, source = f*(I+di) + q
        =>  u = k//2 + f*di + q - p,   di in [-t, t], t = (k//2 + f-1)//f

    so the packed kernel wd[di,dj,(qy,qx,ci),(py,px,co)] =
    kflat[u,v,co] * delta(ci,co), gathered from a zero-padded copy of
    kflat (out-of-range taps land on the padding). The extra terms are
    multiplications by zero — identical math; MXU accumulates in f32.

    x: (B,H,W,C), H,W divisible by f; kflat: (k,k,C); b: (C,) or None.
    Production uses: the MixConvNeXtML c1 block dwconv (C=3, k=7, f=4)
    and the MidMLKA mid32 bank (C=32, k=9, f=2).

    Implementation: the depthwise kernel is a channel-diagonal dense
    kernel — one shared packing/index-algebra path (conv2d_s2d).
    """
    assert kflat.shape[0] == k, (kflat.shape, k)
    c = x.shape[-1]
    eye = jnp.eye(c, dtype=kflat.dtype)
    w_dense = kflat[:, :, None, :] * eye[None, None, :, :]
    return conv2d_s2d(x, w_dense, b, f)


def _s2d_pack_kernel(w, f):
    """Pack a dense 'same' stride-1 odd-k HWIO kernel for f x f
    space-to-depth operands: W[di,dj,(qy,qx,ci),(py,px,co)] = w[u,v,ci,co]
    with u = k//2 + f*(di-t) + q - p (out-of-range taps -> zero padding).
    Same index algebra as dw_conv_s2d, without the channel-diagonal mask."""
    k, _, ci, co = w.shape
    t = (k // 2 + f - 1) // f
    pad = f * t + (f - 1) - k // 2
    kp = 2 * t + 1
    wpad = jnp.pad(w, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    di = jnp.arange(kp)[:, None, None]
    ph = jnp.arange(f)[None, :, None]
    qh = jnp.arange(f)[None, None, :]
    u = pad + k // 2 + f * (di - t) + qh - ph
    # w6[di,dj,py,px,qy,qx,ci,co]
    w6 = wpad[u[:, None, :, None, :, None], u[None, :, None, :, None, :], :, :]
    # -> (di,dj, qy,qx,ci, py,px,co)
    w6 = jnp.transpose(w6, (0, 1, 4, 5, 6, 2, 3, 7))
    return w6.reshape(kp, kp, f * f * ci, f * f * co), t


def _s2d(x, f):
    b, h, w, c = x.shape
    xp = x.reshape(b, h // f, f, w // f, f, c)
    return jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(b, h // f, w // f, f * f * c)


def _d2s(y, f, c):
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, f, f, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h * f, w * f, c)


def conv2d_s2d(x, w, b, f):
    """Dense 'same' stride-1 odd-k conv computed on f x f space-to-depth
    packed operands — identical sums (extra terms multiply zero padding),
    but the contraction and output widths grow f^2 x, fixing MXU lane
    starvation for tiny channel counts. See conv2d_lanefix for use."""
    co = w.shape[-1]
    wd, t = _s2d_pack_kernel(w, f)
    bd = None if b is None else jnp.tile(b, f * f)
    wd, bd = jax.lax.optimization_barrier((wd, bd))
    yp = conv2d(_s2d(x, f), wd, bd, stride=1, padding=t)
    return _d2s(yp, f, co)


@jax.custom_vjp
def _conv2d_lanefix(x, w, b):
    return conv2d(x, w, b, stride=1, padding=w.shape[0] // 2)


def _lanefix_fwd(x, w, b):
    return _conv2d_lanefix(x, w, b), (x, w, b)


def _lanefix_bwd(res, dy):
    x, w, b = res
    k = w.shape[0]
    # dx of a 'same' conv = 'same' conv of dy with the spatially-flipped,
    # io-transposed kernel — computed in s2d space: when either channel
    # side is tiny (3-ch images), the plain lowering runs at ~2% MXU lane
    # utilization (res dx 2.0 ms, VGG conv0 dx 1.8 ms in the 256^2 step);
    # packed it is a full-lane conv (~0.2 ms), identical sums.
    wT = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    if dy.shape[1] % 2 == 0 and dy.shape[2] % 2 == 0:
        dx = conv2d_s2d(dy, wT, None, 2)
    else:
        dx = conv2d(dy, wT, None, stride=1, padding=k // 2)
    # dW/db keep the standard lowering (measured wash vs packed)
    _, vjp = jax.vjp(
        lambda wi, bi: conv2d(x, wi, bi, stride=1, padding=k // 2), w, b
    )
    dw, db = vjp(dy)
    return dx.astype(x.dtype), dw, db


_conv2d_lanefix.defvjp(_lanefix_fwd, _lanefix_bwd)


def conv2d_lanefix(x, w, b):
    """'same' stride-1 conv with an s2d-packed dx (see _lanefix_bwd).
    Drop-in for conv2d(x, w, b, stride=1, padding=k//2) on layers whose
    INPUT or OUTPUT channel count is lane-starved (<= ~8): the flagship's
    final res conv (64->3) and the VGG conv0 (3->64)."""
    return _conv2d_lanefix(x, w, b)


def avg_pool2d(x, window, stride=None, padding=0, count_include_pad=True):
    """torch-style AvgPool2d on NHWC (both count_include_pad modes)."""
    if stride is None:
        stride = window
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    padding = _norm_pad(padding)
    dims = (1, *window, 1)
    strides = (1, *stride, 1)
    pads = ((0, 0), *padding, (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    if count_include_pad:
        count = window[0] * window[1]
        return summed / count
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    count = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return summed / count


def reflect_pad2d(x, pad):
    """torch-style ReflectionPad2d on NHWC."""
    if isinstance(pad, int):
        pad = (pad, pad, pad, pad)  # left, right, top, bottom (torch order)
    left, right, top, bottom = pad
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="reflect")


def adaptive_avg_pool(x):
    """AdaptiveAvgPool2d(1): global spatial mean, keeps dims (N,1,1,C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def adaptive_max_pool(x):
    """AdaptiveMaxPool2d(1): global spatial max, keeps dims (N,1,1,C)."""
    return jnp.max(x, axis=(1, 2), keepdims=True)


def upsample_bilinear(x, size):
    """torch nn.Upsample(size, mode='bilinear', align_corners=False).

    jax.image.resize with method='linear' uses half-pixel centers, which is
    exactly torch's align_corners=False convention.
    """
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="linear")
