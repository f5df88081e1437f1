"""Attribute full-train-step device time to model components.

Compiles the fused step with --xla_dump_to, maps every HLO instruction
(incl. ops inside fused computations) to its jax op_name metadata scope,
captures an xprof trace of N chained steps, and joins the two: each trace
event's time is attributed to the flax module path that dominates the
fused computation it executes.

Env: AT_BATCH (16), AT_SIZE (256), AT_GELU (tanh|exact), AT_DEPTH (3).
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("AT_BATCH", "16"))
SIZE = int(os.environ.get("AT_SIZE", "256"))
DEPTH = int(os.environ.get("AT_DEPTH", "3"))

if os.environ.get("AT_GELU", "tanh") == "tanh":
    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)

from dsgan_tpu.models import define_D, define_G, init_params
from dsgan_tpu.models.pix2pix import (
    Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
)
from dsgan_tpu.models.vgg import Vgg16Features
from dsgan_tpu.utils.image_pool import init_pool


def build():
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16)
    d = define_D(6, 32, "basic", dtype=jnp.bfloat16)
    kg, kd, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params_G = init_params(g, kg, (1, SIZE, SIZE, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, SIZE, SIZE, 6), "normal")["params"]
    vgg = Vgg16Features(dtype=jnp.bfloat16, num_taps=4)
    vgg_params = vgg.init(kv, jnp.zeros((1, 64, 64, 3)))
    cfg = Pix2PixConfig(pool_size=50, use_vgg=True, compute_dtype=jnp.bfloat16)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(cfg.pool_size, (SIZE, SIZE, 6), jnp.bfloat16)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    lr = jnp.float32(2e-4)
    compiled = step.lower(state, A, B, lr).compile()
    hlo_text = compiled.as_text()
    return step, state, A, B, lr, hlo_text


def parse_hlo(text):
    """instr/fusion name -> list of op_name metadata scopes inside it."""
    # computation name -> [(bytes_weight, op_name)]
    comp_ops = defaultdict(list)
    cur = None
    for ln in text.splitlines():
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+) (?:\([^)]*\) -> .*{)", ln.strip())
        if ln.strip().startswith(("ENTRY ", "%fused_", "%region", "%while", "%cond")) and "{" in ln:
            m2 = re.match(r"(?:ENTRY )?%?([\w.\-]+)", ln.strip())
            cur = m2.group(1) if m2 else None
            continue
        if ln.strip() == "}":
            cur = None
            continue
        if cur is None:
            continue
        mo = re.search(r'op_name="([^"]+)"', ln)
        if mo:
            comp_ops[cur].append(mo.group(1))
    # instruction -> called computation (for fusions) in ENTRY and nested
    instr_calls = {}
    for mo in re.finditer(r"%([\w.\-]+) = [^\n]*?calls=%([\w.\-]+)", text):
        instr_calls[mo.group(1)] = mo.group(2)
    # instruction -> own op_name (non-fusion entry ops)
    instr_op = {}
    for mo in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", text):
        instr_op[mo.group(1)] = mo.group(2)
    return comp_ops, instr_calls, instr_op


def scope_of(op_name, depth):
    """Collapse 'jit(step)/a/b/c/...' to the first `depth` informative parts."""
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    # drop transpose wrappers for grouping clarity, keep a bwd marker
    bwd = any(p.startswith("transpose") for p in parts)
    parts = [p for p in parts if not p.startswith("transpose")]
    tag = "/".join(parts[:depth]) or op_name
    return ("bwd " if bwd else "fwd ") + tag


def main():
    step, state, A, B, lr, hlo_text = build()
    for _ in range(3):
        state, metrics, _ = step(state, A, B, lr)
    float(np.asarray(metrics["loss_G"]))

    comp_ops, instr_calls, instr_op = parse_hlo(hlo_text)

    outdir = "/tmp/xprof_attr"
    os.system(f"rm -rf {outdir}")
    n = 6
    with jax.profiler.trace(outdir):
        for _ in range(n):
            state, metrics, _ = step(state, A, B, lr)
        float(np.asarray(metrics["loss_G"]))

    from jax.profiler import ProfileData

    paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    pd = ProfileData.from_file(paths[0])
    agg = defaultdict(float)
    samples = defaultdict(lambda: defaultdict(float))
    unattr = 0.0
    total = 0.0
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                total += dur
                nm = ev.name.split(" = ")[0].lstrip("%")
                ops = None
                if nm in instr_calls and instr_calls[nm] in comp_ops:
                    ops = comp_ops[instr_calls[nm]]
                elif nm in instr_op:
                    ops = [instr_op[nm]]
                if not ops:
                    # async copies / scheduling artifacts
                    kind = re.sub(r"[.\d]+$", "", nm)
                    agg["(unattributed) " + kind] += dur
                    unattr += dur
                    continue
                # attribute to the most common scope inside the fusion,
                # preferring conv/dot-bearing scopes (they dominate cost)
                counts = defaultdict(int)
                heavy = defaultdict(int)
                for o in ops:
                    s = scope_of(o, DEPTH)
                    counts[s] += 1
                    leaf = o.split("/")[-1]
                    # NB "conv" alone would also match convert_element_type,
                    # misattributing elementwise fusions to a convert scope
                    if ("conv_general" in o or "conv_transpose" in o
                            or "dwconv" in o or "dot" in leaf
                            or "pallas" in leaf):
                        heavy[s] += 1
                pool = heavy if heavy else counts
                best = max(pool.items(), key=lambda x: x[1])[0]
                agg[best] += dur
                if best in ("fwd mul", "bwd mul", "fwd select_n", "bwd select_n"):
                    samples[best][ev.name.split(" = ")[0]] += dur
    print(f"total sync device ms/step: {total/n:.2f}   unattributed: {unattr/n:.2f}")
    for k, v in sorted(agg.items(), key=lambda x: -x[1])[:int(os.environ.get("AT_TOP","45"))]:
        print(f"{v/n:9.3f} ms  {k}")
    for k, d in samples.items():
        print(f"\n-- events in '{k}' --")
        for nm, v in sorted(d.items(), key=lambda x: -x[1])[:8]:
            print(f"{v/n:9.3f} ms  {nm[:110]}")


if __name__ == "__main__":
    main()
