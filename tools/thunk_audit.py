"""Per-thunk in-step audit of the full fused train step (VERDICT r3 #3).

The round-3 audit probed ONE thunk isolated (upc3 dW) and generalized
"global HBM sharing" to the whole inter-fusion gap. This tool audits the
step exhaustively instead: capture an xprof trace of N chained steps,
aggregate device time per ENTRY thunk, take the prefix covering >=85% of
device time, and for each thunk compute from the compiled HLO

  bytes    — operand + output payload (HBM traffic lower bound; assumes
             no cross-thunk reuse in either direction, so it UNDERcounts
             only via operand re-reads)
  flops    — counted 2*MACs for convolution/dot instructions inside the
             fusion (window/contracting dims parsed from HLO), so
             MXU-bound thunks aren't misread as bandwidth leads
  GB/s, TF/s — achieved rates from the traced in-step time

and a verdict per thunk:

  MXU        — achieved TF/s >= MXU_FRAC of peak (compute-bound; fine)
  HBM        — achieved GB/s >= HBM_FRAC of peak (bandwidth-bound; fine)
  SHARED     — GB/s in [SHARE_FRAC, HBM_FRAC) of peak: consistent with
               the measured global sharing factor (the step's aggregate
               achieved bandwidth), not a per-thunk formulation problem
  LEAD       — below every bound: neither compute- nor traffic-limited;
               worth an isolated probe

Peaks are v5e: 197 TF/s bf16 MXU, 819 GB/s HBM. The step's own aggregate
achieved bandwidth prints first — SHARED is judged against it.

Env: TA_BATCH (16), TA_SIZE (256), TA_N (8 traced steps), TA_COVER
(0.85), TA_TOP (cap rows, 40). Run on the real chip.
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

BATCH = int(os.environ.get("TA_BATCH", "16"))
SIZE = int(os.environ.get("TA_SIZE", "256"))
N = int(os.environ.get("TA_N", "8"))
COVER = float(os.environ.get("TA_COVER", "0.85"))
TOP = int(os.environ.get("TA_TOP", "40"))

MXU_PEAK = 197e12      # v5e bf16
HBM_PEAK = 819e9
MXU_FRAC = 0.35        # >=35% MFU in a single thunk => compute-bound
HBM_FRAC = 0.60        # >=60% of HBM peak => bandwidth-bound outright

_DTYPE_BYTES = {
    "pred": 1, "u8": 1, "s8": 1, "bf16": 2, "f16": 2, "u16": 2, "s16": 2,
    "f32": 4, "u32": 4, "s32": 4, "f64": 8, "u64": 8, "s64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(s):
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def shape_dims(s):
    m = _SHAPE_RE.search(s)
    if not m:
        return []
    return [int(d) for d in m.group(2).split(",") if d]


def parse_hlo(text):
    """Return (thunk_bytes, thunk_flops, thunk_kind) keyed by ENTRY
    instruction name, plus fusion-computation flops for calls."""
    # pass 1: every instruction's output shape (all computations) —
    # operands are referenced by name from the ENTRY thunk line.
    out_shape = {}
    for mo in re.finditer(r"%?([\w.\-]+) = (\([^)]*\)|\S+) ", text):
        out_shape[mo.group(1)] = mo.group(2)

    # pass 2: flops of conv/dot instructions, attributed to the
    # computation (fusion body or ENTRY) they appear in.
    comp_flops = defaultdict(float)
    comp_has_heavy = defaultdict(bool)
    cur = "ENTRY"
    for ln in text.splitlines():
        st = ln.strip()
        if st.endswith("{") and ("ENTRY" in st or st.startswith("%")):
            m2 = re.match(r"(?:ENTRY )?%?([\w.\-]+)", st)
            if m2:
                cur = m2.group(1)
            continue
        if st == "}":
            cur = "ENTRY"
            continue
        if " convolution(" in st or " dot(" in st:
            comp_has_heavy[cur] = True
            comp_flops[cur] += instr_flops(st, out_shape)
        if "custom-call" in st and "pallas" in st.lower():
            comp_has_heavy[cur] = True  # flops unknown; probed separately

    # pass 3: ENTRY thunks — name, operands, calls target.
    thunks = {}
    in_entry = False
    for ln in text.splitlines():
        st = ln.strip()
        if st.startswith("ENTRY") and st.endswith("{"):
            in_entry = True
            continue
        if in_entry and st == "}":
            break
        if not in_entry or " = " not in st:
            continue
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|\S+) (\w[\w\-]*)\(", st)
        if not m:
            continue
        name, oshape, opkind = m.groups()
        ops = re.findall(r"%([\w.\-]+)", st.split("(", 1)[1])
        b = shape_bytes(oshape)
        for o in ops:
            if o in out_shape:
                b += shape_bytes(out_shape[o])
        callee = None
        mc = re.search(r"calls=%?([\w.\-]+)", st)
        if mc:
            callee = mc.group(1)
        fl = comp_flops.get(callee, 0.0) if callee else 0.0
        if opkind in ("convolution", "dot"):
            fl = instr_flops(st, out_shape)
        heavy = (callee and comp_has_heavy.get(callee)) or opkind in (
            "convolution", "dot", "custom-call")
        mo = re.search(r'op_name="([^"]*)"', st)
        thunks[name] = {"bytes": b, "flops": fl, "kind": opkind,
                        "heavy": bool(heavy),
                        "op_name": mo.group(1) if mo else ""}
    return thunks


def instr_flops(line, out_shape):
    """2*MACs for one convolution( / dot( HLO line."""
    m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\S+) (convolution|dot)\(", line.strip())
    if not m:
        return 0.0
    oshape = m.group(2)
    out_elems = 1
    for d in shape_dims(oshape):
        out_elems *= d
    ops = re.findall(r"%([\w.\-]+)", line.split("(", 1)[1])
    if len(ops) < 2:
        return 0.0
    if m.group(3) == "dot":
        # K = contracting dim of lhs
        mo = re.search(r"lhs_contracting_dims=\{(\d+)", line)
        lhs = shape_dims(out_shape.get(ops[0], ""))
        if not lhs or not mo:
            return 0.0
        k = lhs[int(mo.group(1))] if int(mo.group(1)) < len(lhs) else 1
        return 2.0 * out_elems * k
    # convolution: MACs/out = prod(window) * Cin / (feature_groups*batch_groups)
    mw = re.search(r"window=\{size=([\dx]+)", line)
    md = re.search(r"dim_labels=(\S+?)[,}]", line)
    rhs = shape_dims(out_shape.get(ops[1], ""))
    if not (mw and rhs):
        return 0.0
    win = 1
    for d in mw.group(1).split("x"):
        win *= int(d)
    fg = 1
    mf = re.search(r"feature_group_count=(\d+)", line)
    if mf:
        fg = int(mf.group(1))
    # rhs labels like 01io or io01 — input-feature dim is 'i'
    cin = 1
    if md:
        rhs_lab = md.group(1).split("_")[1].split("->")[0]
        if "i" in rhs_lab and len(rhs_lab) == len(rhs):
            cin = rhs[rhs_lab.index("i")]
    return 2.0 * out_elems * win * cin  # fg already folded into rhs 'i'


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.attribute_trace import build, parse_hlo as scopes_hlo, scope_of

    step, state, A, B, lr, hlo_text = build()
    for _ in range(3):
        state, metrics, _ = step(state, A, B, lr)
    float(np.asarray(metrics["loss_G"]))

    thunks = parse_hlo(hlo_text)
    comp_ops, instr_calls, instr_op = scopes_hlo(hlo_text)

    outdir = "/tmp/xprof_thunks"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(N):
            state, metrics, _ = step(state, A, B, lr)
        float(np.asarray(metrics["loss_G"]))

    from jax.profiler import ProfileData

    paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    agg = defaultdict(float)
    ev_stats = defaultdict(dict)
    total = 0.0
    for path in paths:
        pd = ProfileData.from_file(path)
        for plane in pd.planes:
            if "TPU" not in plane.name or "device" not in plane.name.lower():
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    dur = ev.duration_ns / 1e6
                    total += dur
                    nm = ev.name.split(" = ")[0].lstrip("%")
                    agg[nm] += dur
                    try:
                        for k, v in ev.stats:
                            if k in ("bytes_accessed", "flops", "model_flops"):
                                ev_stats[nm][k] = v
                    except Exception:
                        pass

    step_ms = total / N
    step_bytes = sum(t["bytes"] for t in thunks.values())
    agg_bw = step_bytes / (step_ms / 1e3) / 1e9
    share_frac = min(agg_bw / (HBM_PEAK / 1e9), 1.0)
    print(f"device {step_ms:.2f} ms/step over {N} steps; "
          f"HLO-counted payload {step_bytes/1e9:.1f} GB/step; "
          f"aggregate achieved {agg_bw:.0f} GB/s "
          f"({100*share_frac:.0f}% of peak — the global sharing factor)")
    if ev_stats:
        print("(xprof per-op stats present: "
              + ",".join(sorted(next(iter(ev_stats.values())))) + ")")

    rows = sorted(agg.items(), key=lambda x: -x[1])
    covered = 0.0
    table = []
    for nm, ms_total in rows:
        ms = ms_total / N
        info = thunks.get(nm)
        covered += ms_total
        if info is None:
            table.append((ms, nm, None))
        else:
            table.append((ms, nm, info))
        if covered / total >= COVER and len(table) >= 10:
            break

    print(f"\ntop {len(table)} thunks cover {100*covered/total:.1f}% of device time")
    print(f"{'ms':>8} {'GB/s':>6} {'TF/s':>6} {'verdict':>8}  thunk")
    leads = []
    for ms, nm, info in table[:TOP]:
        if info is None:
            print(f"{ms:8.3f} {'?':>6} {'?':>6} {'(meta)':>8}  {nm[:70]}")
            continue
        gbs = info["bytes"] / (ms / 1e3) / 1e9 if ms > 0 else 0.0
        tfs = info["flops"] / (ms / 1e3) / 1e12 if ms > 0 else 0.0
        if tfs >= MXU_FRAC * MXU_PEAK / 1e12:
            v = "MXU"
        elif gbs >= HBM_FRAC * HBM_PEAK / 1e9:
            v = "HBM"
        elif gbs >= 0.5 * agg_bw:
            v = "SHARED"
        elif info["kind"] == "custom-call":
            v = "PALLAS"  # probed separately (docs/PERF.md audit table)
        else:
            v = "LEAD"
            leads.append((ms, nm, gbs, tfs))
        # label with the thunk's OWN HLO metadata op_name (authoritative —
        # the dominant-scope join below mislabeled fusion.2403 as "fwd
        # up3" when its entry metadata says transpose(...)upc3 dW);
        # fall back to the dominant module scope of the fused computation
        scope = info.get("op_name", "")
        if scope:
            scope = scope.replace("jit(step)/", "").replace(
                "jvp(MixConvNeXtML)", "jvp").replace(
                "transpose(jvp)", "BWD")
        elif nm in instr_calls and instr_calls[nm] in comp_ops:
            cnt = defaultdict(int)
            for o in comp_ops[instr_calls[nm]]:
                cnt[scope_of(o, 3)] += 1
            scope = max(cnt.items(), key=lambda x: x[1])[0]
        elif nm in instr_op:
            scope = scope_of(instr_op[nm], 3)
        print(f"{ms:8.3f} {gbs:6.0f} {tfs:6.1f} {v:>8}  {nm[:44]:44s} {scope[:50]}")

    print(f"\n{len(leads)} LEAD thunks (neither compute- nor traffic-consistent):")
    for ms, nm, gbs, tfs in leads:
        print(f"  {ms:7.3f} ms  {gbs:5.0f} GB/s  {tfs:4.1f} TF/s  {nm[:70]}")


if __name__ == "__main__":
    main()
