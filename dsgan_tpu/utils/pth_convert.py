"""PyTorch checkpoint -> flax params converters.

Lets reference-trained DS-GAN weights (.pth state_dicts, reference
save format base_model.py:92-103) run on TPU for checkpoint-parity
evaluation, and converts torchvision's vgg16 weights for the perceptual
loss. torch is imported lazily and ONLY here — the framework itself never
depends on it; conversion can also consume a pre-dumped .npz.

Layout rules:
  conv   OIHW  [O,I/g,kh,kw]  -> HWIO [kh,kw,I/g,O]   (transpose 2,3,1,0)
  convT  IOHW  [I,O,kh,kw]    -> HWIO [kh,kw,I,O]     (transpose 2,3,0,1)
         (no spatial flip — ops.conv_transpose2d flips internally)
  linear [O,I]                -> [I,O]                 (transpose)
  PReLU  weight [1]           -> negative_slope scalar
"""

import argparse

import numpy as np


def _load_state_dict(path):
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # DataParallel prefix
            k = k[len("module."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(sd, key):
    return {"kernel": np.ascontiguousarray(sd[key + ".weight"].transpose(2, 3, 1, 0))}


def _conv_b(sd, key):
    out = _conv(sd, key)
    out["bias"] = sd[key + ".bias"]
    return out


def _convt_b(sd, key):
    return {
        "kernel": np.ascontiguousarray(sd[key + ".weight"].transpose(2, 3, 0, 1)),
        "bias": sd[key + ".bias"],
    }


def _linear(sd, key):
    return {"kernel": np.ascontiguousarray(sd[key + ".weight"].T), "bias": sd[key + ".bias"]}


def _prelu(sd, key):
    return {"negative_slope": np.asarray(sd[key + ".weight"]).reshape(())}


def _block(sd, prefix):
    """ConvNeXt Block params (reference Block, MixConvNeXtML.py:203-243)."""
    return {
        "shortcut": _conv(sd, prefix + ".shortcut"),
        "dwconv": _conv_b(sd, prefix + ".dwconv"),
        "pwconv1": _linear(sd, prefix + ".pwconv1"),
        "pwconv2": _linear(sd, prefix + ".pwconv2"),
    }


def _ca(sd, prefix):
    return {
        "fc1": _conv(sd, prefix + ".fc1"),
        "fc2": _conv(sd, prefix + ".fc2"),
        "relu1": _prelu(sd, prefix + ".relu1"),
    }


def _midmlka(sd, prefix):
    return {
        "X3": _conv_b(sd, prefix + ".X3"),
        "X5": _conv_b(sd, prefix + ".X5"),
        "X7": _conv_b(sd, prefix + ".X7"),
        "X9": _conv_b(sd, prefix + ".X9"),
        "conv": _conv_b(sd, prefix + ".conv"),
        "attn": _ca(sd, prefix + ".attn"),
    }


def convert_mixconvnext(path):
    """Reference MixConvNeXtML state_dict -> flax params for
    dsgan_tpu.models.mixconvnext.MixConvNeXtML."""
    sd = _load_state_dict(path)
    p = {}
    for i in range(1, 6):
        p[f"c{i}"] = _block(sd, f"c{i}")
    for i in range(1, 5):
        p[f"uc{i}"] = _block(sd, f"uc{i}")
        p[f"u{i}"] = {"deconv": _convt_b(sd, f"u{i}.model.0")}

    # downSkip families: torch names projections by out_channels/64
    # (down64.to2..to16 etc.), ours by pool scale.
    for ours, torch_mod, pairs in (
        ("down64", "down64", ((2, 2), (4, 4), (8, 8), (16, 16))),
        ("down128", "down128", ((2, 4), (4, 8), (8, 16))),
        ("down256", "down256", ((2, 8), (4, 16))),
        ("down512", "down512", ((2, 16),)),
    ):
        for scale, chmul in pairs:
            p[f"{ours}_to{scale}"] = {"proj": _conv(sd, f"{torch_mod}.to{chmul}.1")}

    local = {
        "to32": _conv(sd, "local.to32"),
        "to64": _conv(sd, "local.to64"),
        "to128": _conv(sd, "local.to128"),
        "to256": _conv(sd, "local.to256"),
        "mid32": _midmlka(sd, "local.mid32"),
        "mid64": _midmlka(sd, "local.mid64"),
        "mid128": _midmlka(sd, "local.mid128"),
        "mid256": _midmlka(sd, "local.mid256"),
        "up1": {"deconv": _convt_b(sd, "local.up1.model.0")},
        "up2": {"deconv": _convt_b(sd, "local.up2.model.0")},
        "up3": {"deconv": _convt_b(sd, "local.up3.model.0")},
        "upc1_proj": _conv(sd, "local.upc1.0"),
        "upc1": _midmlka(sd, "local.upc1.1"),
        "upc2": _midmlka(sd, "local.upc2"),
        "upc3": _midmlka(sd, "local.upc3"),
        "up4": _convt_b(sd, "local.up4.0"),
        "shortcut": _conv(sd, "local.shortcut.0"),
    }
    p["local"] = local
    p["res"] = _conv_b(sd, "res")
    return p


def convert_nlayer_discriminator(path, n_layers=3):
    """Reference NLayerDiscriminator (instance norm) state_dict -> flax
    params. Sequence indices: conv at 0, then (conv,norm,leaky) triples —
    with param-free InstanceNorm the convs sit at 0, 2, 5, 8, ..."""
    sd = _load_state_dict(path)
    p = {"conv0": _conv_b(sd, "model.0")}
    idx = 2
    for n in range(1, n_layers + 1):
        p[f"conv{n}"] = _conv_b(sd, f"model.{idx}")
        idx += 3
    p["conv_out"] = _conv_b(sd, f"model.{idx}")
    return p


def convert_vgg16(pth_path, npz_out):
    """torchvision vgg16 state_dict -> .npz consumed by
    dsgan_tpu.models.vgg.load_torchvision_npz."""
    sd = _load_state_dict(pth_path)
    keep = {k: v for k, v in sd.items() if k.startswith("features.")}
    np.savez(npz_out, **keep)
    return npz_out


def convert_resnet_generator(path):
    """Reference ResnetGenerator (networks.py:215-262, instance norm,
    any n_blocks/ngf/padding, with or without dropout) -> our
    generators_zoo.ResnetGenerator param tree.

    The torch module is one nn.Sequential, so keys are positional
    (model.N...). Rather than hard-coding index arithmetic (which shifts
    with use_dropout and padding_type), walk the indices in order and
    assign by module KIND: the conv sequence is [conv_in, down0, down1,
    <blocks>, up0(T), up1(T), conv_out], preludes in the same order.
    InstanceNorm2d(affine=False) contributes no parameters."""
    sd = _load_state_dict(path)

    tops = {}
    for k in sd:
        assert k.startswith("model."), k
        tops.setdefault(int(k.split(".")[1]), []).append(k)

    params = {}
    convs, prelus, blocks = [], [], []
    for idx in sorted(tops):
        keys = tops[idx]
        if any("conv_block" in k for k in keys):
            blocks.append(keys)
        elif any(sd[k].ndim == 4 for k in keys):
            convs.append(idx)
        else:
            prelus.append(idx)

    conv_names = ["conv_in", "down0", "down1", "up0", "up1", "conv_out"]
    assert len(convs) == len(conv_names), (len(convs), conv_names)
    for name, idx in zip(conv_names, convs):
        w = sd[f"model.{idx}.weight"]
        if name.startswith("up"):  # ConvTranspose2d: IOHW -> HWIO
            entry = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
        else:
            entry = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
        if f"model.{idx}.bias" in sd:
            entry["bias"] = sd[f"model.{idx}.bias"]
        params[name] = entry

    prelu_names = ["prelu_in", "down_prelu0", "down_prelu1",
                   "up_prelu0", "up_prelu1"]
    assert len(prelus) == len(prelu_names), (len(prelus), prelu_names)
    for name, idx in zip(prelu_names, prelus):
        params[name] = _prelu(sd, f"model.{idx}")

    for i, keys in enumerate(blocks):
        sub = {}
        for k in keys:
            sub.setdefault(int(k.split(".")[3]), []).append(k)
        bconvs = [j for j in sorted(sub) if any(sd[k].ndim == 4 for k in sub[j])]
        bprelus = [j for j in sorted(sub)
                   if j not in bconvs]
        assert len(bconvs) == 2 and len(bprelus) == 1, (bconvs, bprelus)
        base = ".".join(keys[0].split(".")[:3])  # model.N.conv_block
        blk = {
            "conv1": _conv_b(sd, f"{base}.{bconvs[0]}"),
            "conv2": _conv_b(sd, f"{base}.{bconvs[1]}"),
            "prelu": _prelu(sd, f"{base}.{bprelus[0]}"),
        }
        params[f"block{i}"] = blk
    return params


def convert_unet_generator(path):
    """Reference UnetGenerator (networks.py:449-530, recursive
    UnetSkipConnectionBlock nesting, instance norm) -> our flattened
    generators_zoo.UnetGenerator param tree (down{i}/up{i}/up_prelu{i},
    level 0 = outermost).

    Each recursion level owns exactly: a down Conv2d, an up PReLU, an up
    ConvTranspose2d (norms are InstanceNorm2d(affine=False), relus on the
    down path are parameterless LeakyReLU); nested keys carry a further
    '.model.' segment. Walk the nesting instead of hard-coding indices so
    dropout/innermost index shifts are irrelevant."""
    sd = _load_state_dict(path)
    params = {}

    def conv_entry(base, transposed):
        w = sd[base + ".weight"]
        perm = (2, 3, 0, 1) if transposed else (2, 3, 1, 0)
        entry = {"kernel": np.ascontiguousarray(w.transpose(*perm))}
        if base + ".bias" in sd:
            entry["bias"] = sd[base + ".bias"]
        return entry

    def walk(prefix, level):
        groups = {}
        for k in sd:
            if k.startswith(prefix):
                rest = k[len(prefix):]
                groups.setdefault(int(rest.split(".")[0]), []).append(k)
        assert groups, f"no keys under {prefix!r}"
        convs, prelu_idx, sub_idx = [], None, None
        for idx in sorted(groups):
            ks = groups[idx]
            if any(k[len(prefix):].split(".")[1] == "model" for k in ks):
                sub_idx = idx
            elif any(sd[k].ndim == 4 for k in ks):
                convs.append(idx)
            else:
                prelu_idx = idx
        assert len(convs) == 2 and prelu_idx is not None, (prefix, convs)
        params[f"down{level}"] = conv_entry(f"{prefix}{convs[0]}", False)
        params[f"up{level}"] = conv_entry(f"{prefix}{convs[1]}", True)
        params[f"up_prelu{level}"] = _prelu(sd, f"{prefix}{prelu_idx}")
        if sub_idx is not None:
            walk(f"{prefix}{sub_idx}.model.", level + 1)

    walk("model.model.", 0)
    return params


def convert_gll_generator(path):
    """Reference 'gll' LocalEnhancer (networks.py:265-324: truncated
    pix2pixHD GlobalGenerator trunk + one local-enhancer branch) -> our
    generators_zoo.LocalEnhancer param tree.

    The reference shares ONE nn.PReLU object across every activation site
    of the global trunk and every ResnetBlock_gll (a Python default-arg
    quirk); the state dict still carries one key per position (all equal),
    so assigning positionally reproduces the shared value at our per-site
    parameters — forward-identical."""
    sd = _load_state_dict(path)

    def groups_under(prefix):
        g = {}
        for k in sd:
            if k.startswith(prefix):
                g.setdefault(int(k[len(prefix):].split(".")[0]), []).append(k)
        return g

    def conv_entry(base, transposed):
        w = sd[base + ".weight"]
        perm = (2, 3, 0, 1) if transposed else (2, 3, 1, 0)
        entry = {"kernel": np.ascontiguousarray(w.transpose(*perm))}
        if base + ".bias" in sd:
            entry["bias"] = sd[base + ".bias"]
        return entry

    def block_params(base):
        sub = groups_under(base + ".")
        convs = [j for j in sorted(sub) if any(sd[k].ndim == 4 for k in sub[j])]
        prelus = [j for j in sorted(sub) if j not in convs]
        assert len(convs) == 2 and len(prelus) == 1, (base, convs, prelus)
        return {
            "conv1": conv_entry(f"{base}.{convs[0]}", False),
            "conv2": conv_entry(f"{base}.{convs[1]}", False),
            "prelu": _prelu(sd, f"{base}.{prelus[0]}"),
        }

    def walk_trunk(prefix, conv_names, prelu_names, block_fmt,
                   transposed=()):
        g = groups_under(prefix)
        convs, prelus, blocks = [], [], []
        for idx in sorted(g):
            ks = g[idx]
            if any("conv_block" in k for k in ks):
                blocks.append(idx)
            elif any(sd[k].ndim == 4 for k in ks):
                convs.append(idx)
            else:
                prelus.append(idx)
        assert len(convs) == len(conv_names), (prefix, convs, conv_names)
        assert len(prelus) == len(prelu_names), (prefix, prelus, prelu_names)
        out = {}
        for name, idx in zip(conv_names, convs):
            out[name] = conv_entry(f"{prefix}{idx}", name in transposed)
        for name, idx in zip(prelu_names, prelus):
            out[name] = _prelu(sd, f"{prefix}{idx}")
        for i, idx in enumerate(blocks):
            out[block_fmt.format(i)] = block_params(f"{prefix}{idx}.conv_block")
        return out

    # global trunk width: conv_in + nd downs + nd transposed ups
    nd = (sum(1 for k in sd
              if k.startswith("model.") and "conv_block" not in k
              and k.endswith(".weight") and sd[k].ndim == 4) - 1) // 2
    ups = [f"up{i}" for i in range(nd)]
    params = {"global": walk_trunk(
        "model.",
        ["conv_in"] + [f"down{i}" for i in range(nd)] + ups,
        ["prelu_in"] + [f"down_prelu{i}" for i in range(nd)]
        + [f"up_prelu{i}" for i in range(nd)],
        "block{}", transposed=set(ups),
    )}
    params.update(walk_trunk(
        "model1_1.", ["le1_conv_in", "le1_down"],
        ["le1_prelu_in", "le1_down_prelu"], "UNUSED{}"))
    params.update(walk_trunk(
        "model1_2.", ["le1_up", "le1_conv_out"], ["le1_up_prelu"],
        "le1_block{}", transposed={"le1_up"}))
    return params


def _cbam(sd, prefix):
    """cbam_block params (reference networks.py:983-992)."""
    return {
        "channelattention": {
            "fc1": _conv(sd, prefix + ".channelattention.fc1"),
            "fc2": _conv(sd, prefix + ".channelattention.fc2"),
            "relu1": _prelu(sd, prefix + ".channelattention.relu1"),
        },
        "spatialattention": {
            "conv1": _conv(sd, prefix + ".spatialattention.conv1"),
        },
    }


def convert_unetpp(path):
    """Reference UnetPlusPlus (networks.py:995-1071) -> our
    models.blocks_extra.UnetPlusPlus param tree. The reference's
    conv1_4/att1_4 layers are dead (its forward reuses conv1_2/att1_2,
    networks.py:1066-1067) — their keys are dropped; instance norms carry
    no params."""
    sd = _load_state_dict(path)

    def convd(p):
        return {"conv1": _conv_b(sd, p + ".ConvD.0"),
                "conv2": _conv_b(sd, p + ".ConvD.4")}

    def convn(p):
        return {"conv1": _conv_b(sd, p + ".ConvN.0")}

    def convu(p):
        return {"deconv": _convt_b(sd, p + ".ConvU.0")}

    params = {
        "conv2_1": convd("conv2_1"), "att2_1": _cbam(sd, "att2_1"),
        "conv3_1": convd("conv3_1"), "att3_1": _cbam(sd, "att3_1"),
        "conv4_1": convd("conv4_1"), "att4_1": _cbam(sd, "att4_1"),
        "conv4_2": convn("conv4_2"), "att4_2": _cbam(sd, "att4_2"),
        "conv4_3": convu("conv4_3"), "att4_3": _cbam(sd, "att4_3"),
        "conv3_2": convn("conv3_2"), "att3_2": _cbam(sd, "att3_2"),
        "conv3_3": convu("conv3_3"), "att3_3": _cbam(sd, "att3_3"),
        "conv2_2": convn("conv2_2"), "att2_2": _cbam(sd, "att2_2"),
        "conv2_3": convu("conv2_3"), "att2_3": _cbam(sd, "att2_3"),
        "conv1_2": convn("conv1_2"), "att1_2": _cbam(sd, "att1_2"),
        "conv": _conv_b(sd, "conv"),
    }
    return params


def convert_wnet(path, norm="batch"):
    """Reference wnet (networks_wnet.py:4-51) -> (params, batch_stats)
    for models.blocks_extra.WNet. The shared PReLU appears once per
    Sequential in the state dict (all aliases of one tensor); any copy
    supplies the single shared slope. With norm='batch' the BatchNorm2d
    affine + running stats map into params / batch_stats; with
    'instance' the norm carries nothing."""
    sd = _load_state_dict(path)
    stages = [
        ("en_down_1_1", False), ("en_down_2_1", False), ("en_down_3_1", False),
        ("en_up_2_2", True), ("en_up_1_2", True),
        ("de_down_1_1", False), ("de_down_2_1", False), ("de_down_3_1", False),
        ("de_up_2_2", True), ("de_up_1_2", True), ("de_up_1_3", False),
    ]
    params = {"activate": _prelu(sd, stages[0][0] + ".2")}
    batch_stats = {}
    for name, transposed in stages:
        conv_key = name + ".0"
        site = name + ("_deconv" if transposed else "_conv")
        params[site] = (_convt_b if transposed else _conv_b)(sd, conv_key)
        if norm == "batch":
            nk = name + ".1"
            params[name + "_norm"] = {"scale": sd[nk + ".weight"],
                                      "bias": sd[nk + ".bias"]}
            batch_stats[name + "_norm"] = {"mean": sd[nk + ".running_mean"],
                                           "var": sd[nk + ".running_var"]}
    return params, batch_stats


def convert_inception(pth_path, npz_out):
    """Inception3 state_dict (torchvision inception_v3 OR the TF-ported
    FID weight file — same key schema) -> .npz consumed by
    dsgan_tpu.models.inception.load_torchvision_npz. Raw keys are kept;
    the loader does the OIHW->HWIO mapping."""
    sd = _load_state_dict(pth_path)
    keep = {k: v for k, v in sd.items()
            if not k.startswith(("fc.", "AuxLogits."))
            and not k.endswith("num_batches_tracked")}
    np.savez(npz_out, **keep)
    return npz_out


def save_params_npz(params, path):
    """Flatten a flax params dict into an npz (slash-joined keys)."""
    from flax import traverse_util

    flat = {"/".join(k): np.asarray(v) for k, v in traverse_util.flatten_dict(params).items()}
    np.savez(path, **flat)


def load_params_npz(path):
    from flax import traverse_util

    data = np.load(path)
    flat = {tuple(k.split("/")): data[k] for k in data.files}
    return traverse_util.unflatten_dict(flat)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind",
                    choices=["g", "d", "vgg", "inception", "resnet_g",
                             "unet_g", "gll_g", "unetpp_g", "wnet"],
                    help="which network the .pth holds (g = MixConvNeXtML)")
    ap.add_argument("pth", help="input .pth (or pre-dumped .npz) path")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--n_layers", type=int, default=3)
    args = ap.parse_args()
    if args.kind == "vgg":
        convert_vgg16(args.pth, args.out)
    elif args.kind == "inception":
        convert_inception(args.pth, args.out)
    elif args.kind == "g":
        save_params_npz(convert_mixconvnext(args.pth), args.out)
    elif args.kind == "resnet_g":
        save_params_npz(convert_resnet_generator(args.pth), args.out)
    elif args.kind == "unet_g":
        save_params_npz(convert_unet_generator(args.pth), args.out)
    elif args.kind == "gll_g":
        save_params_npz(convert_gll_generator(args.pth), args.out)
    elif args.kind == "unetpp_g":
        save_params_npz(convert_unetpp(args.pth), args.out)
    elif args.kind == "wnet":
        params, batch_stats = convert_wnet(args.pth)
        save_params_npz({"params": params, "batch_stats": batch_stats}, args.out)
    else:
        save_params_npz(convert_nlayer_discriminator(args.pth, args.n_layers), args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
