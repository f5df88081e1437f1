"""Factories: define_G / define_D / create_model + param (re)initialization.

Mirrors the reference's registries (models/__init__.py:4-37 and
networks.py:81-131) with the same recipe names, so reference command lines
run unchanged. ``init_params`` plays the role of init_net
(networks.py:73-79): construct, then re-initialize every Conv/Linear
kernel per --init_type with gain 0.02 and zero the biases.
"""

import importlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from dsgan_tpu.models.discriminators import (
    MultiscaleDiscriminator,
    NLayerDiscriminator,
    PixelDiscriminator,
)
from dsgan_tpu.models.generators_zoo import (
    CascadedGenerator,
    LocalEnhancer,
    ResnetGenerator,
    UnetGenerator,
)
from dsgan_tpu.models.mixconvnext import MixConvNeXtML
from dsgan_tpu.ops.initializers import make_initializer


def define_G(input_nc, output_nc, ngf, which_model_netG, norm="instance",
             use_dropout=False, dtype=jnp.bfloat16, remat=False,
             inference=False):
    """Generator factory (reference networks.py:81-113). ``remat``
    enables activation rematerialization on the flagship generator's
    Blocks (memory-for-FLOPs for large batch/resolution). ``inference``
    builds the forward-only variant: the fused Pallas block path is
    skipped there (its win is the fused backward; forward-only it loses
    to XLA — 18.6 vs 11.5 ms at 512^2 batch 1, measured)."""
    if which_model_netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, norm, use_dropout, dtype=dtype)
    if which_model_netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, 6, norm, use_dropout, dtype=dtype)
    if which_model_netG == "unet_128":
        return UnetGenerator(output_nc, 7, ngf, norm, use_dropout, dtype=dtype)
    if which_model_netG == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm, use_dropout, dtype=dtype)
    if which_model_netG == "gll":
        return LocalEnhancer(output_nc, ngf, 3, 9, 1, 3, norm, dtype=dtype)
    if which_model_netG == "cascaded":
        return CascadedGenerator(output_nc, ngf, dtype=dtype)
    if which_model_netG == "MixConvNeXtML":
        return MixConvNeXtML(dtype=dtype, remat=remat, inference=inference)
    # Extension names (not reachable from the reference's dispatch —
    # these rebuild its orphaned modules, see models/blocks_extra.py):
    if which_model_netG == "unetpp":
        from dsgan_tpu.models.blocks_extra import UnetPlusPlus

        return UnetPlusPlus(output_nc, ngf, norm, dtype=dtype)
    if which_model_netG == "wnet":
        from dsgan_tpu.models.blocks_extra import WNet

        return WNet(ngf, norm, dtype=dtype)
    raise NotImplementedError(
        f"Generator model name [{which_model_netG}] is not recognized"
    )


def define_D(input_nc, ndf, which_model_netD, n_layers_D=3, norm="instance",
             use_sigmoid=False, dtype=jnp.bfloat16):
    """Discriminator factory (reference networks.py:115-131)."""
    if which_model_netD == "basic":
        return NLayerDiscriminator(ndf, 3, norm, use_sigmoid, dtype=dtype)
    if which_model_netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers_D, norm, use_sigmoid, dtype=dtype)
    if which_model_netD == "pixel":
        return PixelDiscriminator(ndf, norm, use_sigmoid, dtype=dtype)
    if which_model_netD == "multi":
        return MultiscaleDiscriminator(ndf, n_layers_D, norm, use_sigmoid, 3, dtype=dtype)
    raise NotImplementedError(
        f"Discriminator model name [{which_model_netD}] is not recognized"
    )


def reinit_params(variables, init_type, rng, gain=0.02):
    """Post-construction re-init (reference init_weights, networks.py:49-70).

    Every 'kernel' leaf is redrawn from the selected scheme; conv/dense
    biases are zeroed; BatchNorm scale ~ N(1, gain); PReLU slopes and
    batch_stats are untouched.
    """
    init_fn = make_initializer(init_type, gain)
    params = variables["params"]
    flat = traverse_util.flatten_dict(params)
    keys = jax.random.split(rng, max(len(flat), 1))
    new_flat = {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        name = path[-1]
        parent = path[-2] if len(path) > 1 else ""
        if name == "kernel":
            new_flat[path] = init_fn(keys[i], leaf.shape, leaf.dtype)
        elif name == "bias":
            new_flat[path] = jnp.zeros_like(leaf)
        elif name == "scale" and "norm" in parent.lower():
            new_flat[path] = 1.0 + gain * jax.random.normal(keys[i], leaf.shape, leaf.dtype)
        elif name in ("gamma",):
            new_flat[path] = jnp.ones_like(leaf)
        elif name in ("beta",):
            new_flat[path] = jnp.zeros_like(leaf)
        else:
            new_flat[path] = leaf
    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(new_flat)
    return out


def init_params(module, rng, sample_shape, init_type="normal", train=False):
    """Construct + initialize module params (the init_net equivalent).

    Returns the full variables dict (params [+ batch_stats for batch-norm
    recipes]). ``sample_shape`` is the NHWC input shape used for shape
    inference; actual batch size at train time may differ.

    The whole construct+reinit runs as ONE jitted program: per-leaf init
    as eager ops would mean hundreds of tiny compilations, which is
    pathological on remote-compile TPU backends.
    """
    import inspect

    takes_train = "train" in inspect.signature(module.__call__).parameters

    def _build(rng):
        dummy = jnp.zeros(sample_shape, jnp.float32)
        rng_init, rng_reinit, rng_drop = jax.random.split(rng, 3)
        rngs = {"params": rng_init, "dropout": rng_drop}
        if takes_train:
            variables = module.init(rngs, dummy, train)
        else:
            variables = module.init(rngs, dummy)
        return reinit_params(variables, init_type, rng_reinit)

    return jax.jit(_build)(rng)


def find_model_using_name(model_name):
    """Import dsgan_tpu.models.<name> and return its <Name>Model class
    (reference models/__init__.py:4-25)."""
    modname = "dsgan_tpu.models." + model_name
    modellib = importlib.import_module(modname)
    target = model_name.replace("_", "") + "model"
    for name in dir(modellib):
        cls = getattr(modellib, name)
        if name.lower() == target and isinstance(cls, type):
            return cls
    raise SystemExit(
        f"In {modname}.py, there should be a class named {target} (case-insensitive)."
    )


def get_option_setter(model_name):
    return find_model_using_name(model_name).modify_commandline_options


def create_model(opt):
    cls = find_model_using_name(opt.model)
    instance = cls()
    instance.initialize(opt)
    print(f"model [{instance.name()}] was created")
    return instance
