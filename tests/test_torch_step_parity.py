"""ONE-STEP TRAINER PARITY against the reference's torch implementation.

The strongest available proof that the fused TPU step implements the SAME
training algorithm as reference DSGAN/models/pix2pix_model.py:141-217:
run the reference Pix2PixModel (torch, CPU, imported straight from
/root/reference — never copied) and our fused jax step from identical
converted weights on an identical batch, then require

  * every loss component to agree (D fake/real, G GAN/L1/TV/SSIM, totals),
  * the post-Adam-step parameters to agree elementwise,

for two consecutive optimize_parameters() calls. Config: default recipe
with pool disabled and w_vgg=0 (the env has no torchvision weights; the
perceptual EXTRACTOR's forward parity is covered by
tests/test_vgg_convert.py and tests/test_pth_parity.py).

Tolerance note: after step 1, Adam's update is -lr*sign(grad) for every
|grad| >> eps, so coordinates whose gradient is dominated by f32
reassociation noise may legitimately land 2*lr apart. We therefore allow
a <0.1% fraction of coordinates to differ and require exact-scale
agreement everywhere else.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference/DSGAN"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_ROOT), reason="reference tree not present"
)


# ---------------------------------------------------------------------------
# reference import machinery (stub the deps this env doesn't ship)
# ---------------------------------------------------------------------------

def _import_reference():
    for name in ("pytorch_msssim", "pytorch_ssim"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.metrics")
        skm.peak_signal_noise_ratio = lambda *a, **k: 0.0
        skm.structural_similarity = lambda *a, **k: 0.0
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")

        def _unavailable(*a, **k):
            raise RuntimeError("no torchvision weights inside the test env")

        tvm.vgg16 = _unavailable
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import models.pix2pix_model as ref_pix2pix

    return ref_pix2pix


class _ZeroVgg(torch.nn.Module):
    """Stands in for the (unavailable) pretrained Vgg16; with w_vgg=0 the
    perceptual term contributes nothing on either side."""

    def type(self, *a, **k):  # absorbs .type(torch.cuda.FloatTensor)
        return self

    def forward(self, x):
        z = x * 0.0
        return [z, z, z, z, z]


def _ref_options():
    return types.SimpleNamespace(
        isTrain=True, gpu_ids=[], checkpoints_dir="/tmp/dsgan_refparity",
        name="refparity", which_direction="AtoB",
        input_nc=3, output_nc=3, ngf=32, ndf=32,
        which_model_netG="MixConvNeXtML", which_model_netD="basic",
        n_layers_D=3, norm="instance", no_dropout=False, init_type="normal",
        no_lsgan=False, use_GAN=1, use_condition=1, pool_size=0,
        w_gan=0.01, w_vgg=0.0, w_tv=1.0, w_ss=1.25,
        lr=2e-4, beta1=0.5, lambda_L1=100.0, continue_train=False,
        resize_or_crop="resize_and_crop", verbose=False,
    )


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def _build_ours(g_pth, d_pth, lr, vgg_npz=None, w_vgg=0.0):
    from dsgan_tpu.models import define_D, define_G
    from dsgan_tpu.models.layers import set_gelu_mode
    from dsgan_tpu.models.pix2pix import (
        Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
    )
    from dsgan_tpu.models.vgg import Vgg16Features, load_torchvision_npz
    from dsgan_tpu.utils.pth_convert import (
        convert_mixconvnext, convert_nlayer_discriminator,
    )

    set_gelu_mode("exact")  # strict erf parity in f32
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=None)
    d = define_D(6, 32, "basic", dtype=None)
    params_G = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), convert_mixconvnext(g_pth)
    )
    params_D = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), convert_nlayer_discriminator(d_pth)
    )
    vgg = vgg_params = None
    if vgg_npz is not None:
        vgg = Vgg16Features(dtype=jnp.float32, num_taps=4)
        vgg_params = load_torchvision_npz(vgg_npz)
    cfg = Pix2PixConfig(
        gan_mode="vanilla", use_gan=True, use_condition=True, pool_size=0,
        w_gan=0.01, w_vgg=w_vgg, w_tv=1.0, w_ss=1.25,
        use_vgg=vgg is not None, beta1=0.5,
    )
    adam = make_adam(cfg.beta1)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=jnp.zeros((0,)), pool_count=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0), step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg))
    return state, step


def _tree_flat(tree):
    out = {}
    for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        out[key] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_one_step_parity_vs_reference(tmp_path):
    ref_pix2pix = _import_reference()

    torch.manual_seed(1234)
    opt = _ref_options()
    ref = ref_pix2pix.Pix2PixModel()
    orig_vgg = ref_pix2pix.Vgg16
    ref_pix2pix.Vgg16 = _ZeroVgg
    try:
        ref.initialize(opt)
    finally:
        ref_pix2pix.Vgg16 = orig_vgg

    g_pth = str(tmp_path / "g.pth")
    d_pth = str(tmp_path / "d.pth")
    torch.save(ref.netG.state_dict(), g_pth)
    torch.save(ref.netD.state_dict(), d_pth)

    rng = np.random.default_rng(99)
    H = W = 64  # full architecture, reduced resolution (CPU golden test)
    A = rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32)

    lr = 2e-4
    state, step = _build_ours(g_pth, d_pth, lr)

    for it in range(2):
        # ---- reference step
        ref.set_input({
            "A": torch.tensor(A.transpose(0, 3, 1, 2)),
            "B": torch.tensor(B.transpose(0, 3, 1, 2)),
            "A_paths": ["x"], "B_paths": ["x"],
        })
        ref.optimize_parameters()
        ref_losses = {
            "loss_D_fake": float(ref.loss_D_fake),
            "loss_D_real": float(ref.loss_D_real),
            "loss_G_GAN": float(ref.loss_G_GAN),
            "loss_G_L1": float(ref.loss_G_L1),
            "loss_tv": float(ref.tv_loss),
            "loss_ssim": float(ref.loss_ssim),
            "loss_G": float(ref.loss_G),
        }

        # ---- our fused step
        state, metrics, _ = step(state, jnp.asarray(A), jnp.asarray(B), jnp.float32(lr))

        for k, v in ref_losses.items():
            ours = float(np.asarray(metrics[k]))
            assert ours == pytest.approx(v, rel=2e-3, abs=2e-4), (
                f"step {it}: {k}: ours={ours} ref={v}"
            )

    # ---- post-step parameter agreement
    from dsgan_tpu.utils.pth_convert import (
        convert_mixconvnext, convert_nlayer_discriminator,
    )

    g_pth2 = str(tmp_path / "g2.pth")
    d_pth2 = str(tmp_path / "d2.pth")
    torch.save(ref.netG.state_dict(), g_pth2)
    torch.save(ref.netD.state_dict(), d_pth2)

    for ours_tree, ref_tree, label in (
        (state.params_G, convert_mixconvnext(g_pth2), "G"),
        (state.params_D, convert_nlayer_discriminator(d_pth2), "D"),
    ):
        ours = _tree_flat(ours_tree)
        ref_flat = _tree_flat(ref_tree)
        assert set(ours) == set(ref_flat)
        total = 0
        mismatched = 0
        worst = 0.0
        for k in ours:
            diff = np.abs(ours[k].astype(np.float64) - ref_flat[k].astype(np.float64))
            total += diff.size
            # sign-flip coords can land 2*lr apart (see module docstring)
            mismatched += int((diff > 0.5 * lr).sum())
            worst = max(worst, float(diff.max()))
        frac = mismatched / total
        assert frac < 1e-3, f"{label}: {frac:.2e} of params off by >0.5*lr"
        # nothing may drift beyond one full double-step; the 10% slack
        # covers true-gradient movement ON TOP of a two-step sign flip
        # (observed worst: 2.052x after an XLA reassociation change)
        assert worst <= 2.2 * 2 * lr, f"{label}: worst |delta| {worst}"
