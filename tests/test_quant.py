"""Weights-only int8 PTQ (dsgan_tpu/quant.py) and the quantized export
path. The reference has no quantization or serving-artifact story at all
(its inference is re-running the torch code, DSGAN/models/test_model.py);
this is a deployment capability on top of the export contract."""
import numpy as np
import pytest


def test_quantize_roundtrip_error_bound():
    from dsgan_tpu.quant import dequantize_params, quant_report, quantize_params

    rng = np.random.default_rng(0)
    params = {
        "conv": {
            # varied per-channel dynamic ranges — exercises per-channel scales
            "kernel": (rng.standard_normal((3, 3, 32, 64)).astype(np.float32)
                       * np.linspace(0.1, 3.0, 64, dtype=np.float32)),
            "bias": rng.standard_normal((64,)).astype(np.float32),
        },
        "dense": {"kernel": rng.standard_normal((256, 128)).astype(np.float32)},
        "tiny2d": rng.standard_normal((8, 8)).astype(np.float32),
    }
    q = quantize_params(params)
    d = dequantize_params(q)

    # small leaves pass through exactly (bias 1-D, tiny2d below min_size)
    np.testing.assert_array_equal(np.asarray(d["conv"]["bias"]),
                                  params["conv"]["bias"])
    np.testing.assert_array_equal(np.asarray(d["tiny2d"]), params["tiny2d"])

    # quantized leaves: |w - deq| <= s_c/2 per output channel
    for outer, inner in (("conv", "kernel"), ("dense", "kernel")):
        w = params[outer][inner]
        deq = np.asarray(d[outer][inner])
        s = np.max(np.abs(w.reshape(-1, w.shape[-1])), axis=0) / 127.0
        assert np.all(np.abs(deq - w) <= s * 0.5 + 1e-7), (outer, inner)

    rep = quant_report(q)
    assert rep["quantized_leaves"] == 2 and rep["float_leaves"] == 2
    assert rep["bytes_q8"] < rep["bytes_f32"] / 3


def _gen(ngf=16):
    import jax
    import jax.numpy as jnp

    from dsgan_tpu.models import define_G, init_params

    g = define_G(3, 3, ngf, "resnet_6blocks", dtype=jnp.float32,
                 inference=True)
    variables = init_params(g, jax.random.PRNGKey(0), (1, 32, 32, 3),
                            "normal")
    return g, variables


def test_w8_export_shrinks_artifact_and_keeps_quality(tmp_path):
    from dsgan_tpu import ops
    from dsgan_tpu.export import (export_generator, load_artifact,
                                  save_artifact)

    g, variables = _gen()
    blob_f, meta_f = export_generator(g, variables, 32, 32, 3,
                                      platforms=("cpu",))
    blob_q, meta_q = export_generator(g, variables, 32, 32, 3,
                                      platforms=("cpu",), quantize="w8")
    assert meta_f["quantize"] == "none" and meta_q["quantize"] == "w8"
    # int8 weight constants must survive into the serialized blob
    assert len(blob_q) < 0.7 * len(blob_f), (len(blob_q), len(blob_f))

    pf = save_artifact(str(tmp_path / "f.stablehlo"), blob_f, meta_f)
    pq = save_artifact(str(tmp_path / "q.stablehlo"), blob_q, meta_q)
    call_f, _ = load_artifact(pf)
    call_q, _ = load_artifact(pq)

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    yf, yq = np.asarray(call_f(x)), np.asarray(call_q(x))
    assert yq.dtype == np.uint8 and yq.shape == yf.shape
    s = float(ops.ssim_uint8(yf, yq))
    p = float(ops.psnr_uint8(yf, yq))
    assert s > 0.95 and p > 30.0, (s, p)


def test_unknown_quantize_mode_rejected():
    from dsgan_tpu.export import _serving_fn

    g, variables = _gen(ngf=8)
    with pytest.raises(ValueError, match="quantize mode"):
        _serving_fn(g, variables, uint8_io=True, quantize="int4")


def test_quant_gate_reports_and_enforces_tol():
    from types import SimpleNamespace

    from dsgan_tpu.export import _quant_gate

    g, variables = _gen()
    opt = SimpleNamespace(fineSize_h=32, fineSize_w=32, input_nc=3)
    gate = _quant_gate(g, variables, opt,
                       SimpleNamespace(quant_tol=0.0))
    assert 0.9 < gate["ssim"] <= 1.0 and gate["psnr"] > 25.0

    with pytest.raises(SystemExit, match="quality gate"):
        _quant_gate(g, variables, opt,
                    SimpleNamespace(quant_tol=1.01))
