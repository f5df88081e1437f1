"""AOT model export for serving — a deployment capability the reference
lacks entirely (its only inference story is re-running the torch training
code; reference DSGAN/models/test_model.py:10-43 still needs the full
framework + checkpoint at serve time).

``export_generator`` serializes the generator's inference graph to a
portable StableHLO artifact via ``jax.export``:

  * trained params are baked into the graph as constants — serve-time
    needs NO model code, NO checkpoint, NO flax: just
    ``dsgan_tpu.export.load_artifact`` (or raw ``jax.export.deserialize``);
  * the full serving pipeline is fused into the one program: uint8 NHWC
    pixels in -> /255*2-1 normalize -> generator -> clip/quantize ->
    uint8 NHWC pixels out (the exact train/eval contract,
    ops/metrics.py:25-45, utils/util.py:8-18);
  * exported for BOTH 'tpu' and 'cpu' by default (the inference build is
    pure XLA — the fused Pallas block path is train-only — so one
    artifact runs on a serving TPU and on a CPU canary alike);
  * the batch dimension is symbolic when the model allows it
    (shape-polymorphic export), so one artifact serves any batch size.

CLI:  python -m dsgan_tpu.export --name X --which_epoch N --out g.stablehlo
"""

import json
import os
import sys

import numpy as np


def _serving_fn(netG, variables, uint8_io, quantize=None):
    """Close the generator over its params: x -> image, optionally with
    the uint8 de/quantization fused in. quantize="w8" bakes the weights
    as per-channel int8 constants dequantized at use (dsgan_tpu/quant.py) —
    the exported blob then carries int8 weight payloads."""
    import jax.numpy as jnp

    from dsgan_tpu import ops
    from dsgan_tpu.models.pix2pix import _apply_net

    if quantize == "w8":
        from dsgan_tpu.quant import dequantize_params, quantize_params

        qparams = quantize_params(variables["params"])

        def get_params():
            return dequantize_params(qparams)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r} (only 'w8')")
    else:
        def get_params():
            return variables["params"]

    def fn(x):
        y = _apply_net(netG, get_params(), ops.normalize_u8(x), False,
                       stats=variables.get("batch_stats"))
        if uint8_io:
            y = ops.metrics.quantize_uint8(y).astype(jnp.uint8)
        return y

    return fn


def export_generator(netG, variables, height, width, input_nc,
                     batch=None, platforms=("tpu", "cpu"), uint8_io=True,
                     quantize=None):
    """Serialize the generator to StableHLO bytes.

    batch=None attempts a symbolic (any-batch) export and falls back to
    batch 1 if the model's graph is not batch-polymorphic. Returns
    (blob, meta) — meta records the I/O contract for the sidecar.
    """
    import jax
    from jax import export as jx

    fn = jax.jit(_serving_fn(netG, variables, uint8_io, quantize))
    in_dtype = np.uint8 if uint8_io else np.float32

    def spec(b):
        return jax.ShapeDtypeStruct((b, height, width, input_nc), in_dtype)

    poly = batch is None
    if poly:
        try:
            blob = jx.export(fn, platforms=list(platforms))(
                spec(jx.symbolic_shape("b")[0])).serialize()
        except Exception as e:  # not batch-polymorphic: fix the batch dim
            print(f"symbolic-batch export unavailable ({type(e).__name__}); "
                  f"fixing batch=1")
            poly, batch = False, 1
    if not poly:
        blob = jx.export(fn, platforms=list(platforms))(spec(batch)).serialize()

    meta = {
        "input": f"uint8 NHWC [{'b' if poly else batch},{height},{width},{input_nc}] raw pixels"
                 if uint8_io else f"float NHWC in [-1,1]",
        "output": "uint8 NHWC RGB" if uint8_io else "float NHWC, unbounded (no tanh)",
        "batch": "polymorphic" if poly else int(batch),
        "height": height, "width": width, "input_nc": input_nc,
        "platforms": list(platforms),
        "uint8_io": bool(uint8_io),
        "quantize": quantize or "none",
    }
    return blob, meta


def save_artifact(path, blob, meta):
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_artifact(path):
    """Deserialize an exported artifact -> (callable, meta). The callable
    maps a host/device NHWC array to the generated image batch."""
    from jax import export as jx

    with open(path, "rb") as f:
        exported = jx.deserialize(f.read())
    meta = {}
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return exported.call, meta


def main(argv=None, dataset_path=None, out_path=None):
    import jax.numpy as jnp

    from dsgan_tpu.models import create_model, registry
    from dsgan_tpu.options.test_options import TestOptions

    parser_holder = TestOptions()
    # export-specific flags ride the standard two-stage option surface
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--out", type=str, default="generator.stablehlo")
    pre.add_argument("--export_batch", type=int, default=0,
                     help="0: batch-polymorphic artifact (falls back to 1)")
    pre.add_argument("--platforms", type=str, default="tpu,cpu")
    pre.add_argument("--float_io", action="store_true",
                     help="export the float [-1,1] contract instead of uint8")
    pre.add_argument("--quantize", type=str, default="", choices=["", "w8"],
                     help="w8: per-channel int8 weights baked into the "
                          "artifact, dequantized at use (halves blob size)")
    pre.add_argument("--quant_tol", type=float, default=0.0,
                     help="fail the export if SSIM(quantized, float) on the "
                          "probe batch drops below this (0 = report only)")
    ex, rest = pre.parse_known_args(argv)
    opt = parser_holder.parse(dataset_path, out_path, rest)

    model = create_model(opt)
    if getattr(opt, "load_npz", ""):
        import jax

        from dsgan_tpu.utils.pth_convert import load_params_npz

        params_G = jax.tree_util.tree_map(jnp.asarray, load_params_npz(opt.load_npz))
        model.state = model.state.replace(params_G=params_G)
    else:
        model.setup(opt)

    state = model.state
    if not hasattr(state, "params_G"):
        raise SystemExit(f"--model {opt.model} has no exportable generator "
                         f"(state carries no params_G)")
    variables = {"params": state.params_G}
    if getattr(state, "stats_G", None):
        variables["batch_stats"] = state.stats_G

    dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else jnp.float32
    netG = registry.define_G(
        opt.input_nc, opt.output_nc, opt.ngf, opt.which_model_netG,
        opt.norm, not opt.no_dropout, dtype=dtype, inference=True,
    )
    blob, meta = export_generator(
        netG, variables, opt.fineSize_h, opt.fineSize_w, opt.input_nc,
        batch=ex.export_batch or None,
        platforms=tuple(ex.platforms.split(",")),
        uint8_io=not ex.float_io,
        quantize=ex.quantize or None,
    )
    if ex.quantize:
        meta["quant_gate"] = _quant_gate(netG, variables, opt, ex)
    path = save_artifact(ex.out, blob, meta)
    print(f"exported {len(blob) / 1e6:.1f} MB artifact to {path}")
    print(json.dumps(meta))


def _quant_gate(netG, variables, opt, ex):
    """Quality gate: run the float and quantized serving graphs on a probe
    batch, report SSIM/PSNR between them, and (with --quant_tol) fail the
    export if quantization moved the outputs too far."""
    import jax
    import numpy as np

    from dsgan_tpu import ops

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (1, opt.fineSize_h, opt.fineSize_w,
                              opt.input_nc), dtype=np.uint8)
    f_ref = jax.jit(_serving_fn(netG, variables, uint8_io=True))
    f_q = jax.jit(_serving_fn(netG, variables, uint8_io=True, quantize="w8"))
    a, b = np.asarray(f_ref(x)), np.asarray(f_q(x))
    s = float(ops.ssim_uint8(a, b))
    p = float(ops.psnr_uint8(a, b))
    print(f"quant gate: SSIM(w8, float) = {s:.4f}  PSNR = {p:.2f} dB"
          f"  (tol {ex.quant_tol})")
    if ex.quant_tol and s < ex.quant_tol:
        raise SystemExit(f"--quantize w8 failed the quality gate: "
                         f"SSIM {s:.4f} < --quant_tol {ex.quant_tol}")
    return {"ssim": s, "psnr": p}


if __name__ == "__main__":
    main(sys.argv[1:])
