"""Pix2Pix training algorithm — the DS-GAN trainer — as ONE fused XLA step.

Reference behavior being matched (DSGAN/models/pix2pix_model.py):
  forward:    fake_B = G(real_A)                                (:138-139)
  D update:   pooled fake_AB (condition: cat(A, fake)) detached,
              0.5*(BCE(D(fake),0) + BCE(D(real),1)), Adam step  (:141-162)
  G update:   BCE(D_new(cat(A, fake)),1)*w_gan + L1
              + VGG-L1(taps 0..3)*w_vgg + TV/(320*256)*w_tv
              + w_ss*(1 - SSIM((B+1)/2,(fake+1)/2))             (:164-199)
  The effective-default GAN criterion is BCEWithLogits
  (GANLoss(use_lsgan=opt.no_lsgan), no_lsgan=False) (:112-114).

TPU-native design:
  * ONE G forward + ONE G backward per step via jax.vjp — the reference
    runs 2-3 G forwards per iteration (train.py:108-115).
  * The replay pool is device state inside the step (utils/image_pool.py).
  * D is updated first, then the G loss is evaluated against the UPDATED
    D (the reference's sequencing), all inside a single jit with donated
    state — zero host round-trips.
  * SSIM/PSNR quality metrics are computed on device in the same program.
"""

import dataclasses
import inspect
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dsgan_tpu import ops
from dsgan_tpu.models import registry
from dsgan_tpu.models.base_model import BaseModel
from dsgan_tpu.models.vgg import Vgg16Features, load_torchvision_npz
from dsgan_tpu.utils.image_pool import init_pool, pool_query


@struct.dataclass
class Pix2PixState:
    params_G: Any
    params_D: Any
    opt_G: Any
    opt_D: Any
    pool_images: Any
    pool_count: Any
    rng: Any
    step: Any
    # BatchNorm running averages (--norm batch): flax batch_stats
    # collections, EMA-updated by the train step, used by eval builds.
    # None (empty pytree) for instance/none recipes.
    stats_G: Any = None
    stats_D: Any = None


@dataclasses.dataclass(frozen=True)
class Pix2PixConfig:
    gan_mode: str = "vanilla"       # 'vanilla' | 'lsgan' | 'bce'
    use_gan: bool = True
    use_condition: bool = True
    pool_size: int = 50
    w_gan: float = 0.01
    w_vgg: float = 1.0
    w_tv: float = 1.0
    w_ss: float = 1.25
    use_vgg: bool = True
    beta1: float = 0.5
    # compute dtype for the image path (None = keep the loader's f32).
    # bf16 halves HBM traffic on every image/feature-space tensor (pool,
    # D inputs, VGG taps); all loss reductions still accumulate in f32
    # (ops/losses.py), and the uint8 quality-metric protocol is unchanged
    # (bf16 resolution at 1.0 equals one uint8 step).
    compute_dtype: Any = None
    # batch the two D applications (fake/real) into one — valid for
    # per-sample norms (instance/none); disabled for batch norm where the
    # combined batch statistics would differ
    fuse_d_batch: bool = True


def make_adam(beta1):
    """torch.optim.Adam direction (lr applied separately so the schedule
    never retraces the step)."""
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8, eps_root=0.0)


def _apply_net(net, params, x, train, rng=None, stats=None):
    kwargs = {}
    if "train" in inspect.signature(net.__call__).parameters:
        kwargs["train"] = train
    rngs = {"dropout": rng} if rng is not None else None
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return net.apply(variables, x, rngs=rngs, **kwargs)


def _apply_net_stats(net, params, stats, x, train, rng=None):
    """Train-mode apply that also EMA-updates BatchNorm running averages.
    Returns (out, new_stats); with no batch_stats (instance/none norms)
    it degrades to the plain apply and passes ``stats`` through."""
    if not stats:
        return _apply_net(net, params, x, train, rng), stats
    kwargs = {}
    if "train" in inspect.signature(net.__call__).parameters:
        kwargs["train"] = train
    rngs = {"dropout": rng} if rng is not None else None
    out, aux = net.apply(
        {"params": params, "batch_stats": stats}, x, rngs=rngs,
        mutable=["batch_stats"], **kwargs
    )
    return out, jax.lax.stop_gradient(aux["batch_stats"])


def _split_scales(pred, n):
    """Split a (possibly multiscale-nested) D output batched as [fake;real]."""
    if isinstance(pred, (list, tuple)):
        pairs = [_split_scales(p, n) for p in pred]
        return [p[0] for p in pairs], [p[1] for p in pairs]
    return pred[:n], pred[n:]


def make_train_step(G, D, vgg: Optional[Vgg16Features], vgg_params, cfg: Pix2PixConfig):
    """Build the pure fused step: (state, real_A, real_B, lr) -> (state, metrics)."""
    adam = make_adam(cfg.beta1)

    def sgd_apply(params, updates, lr):
        return jax.tree_util.tree_map(lambda p, u: p - lr * u.astype(p.dtype), params, updates)

    def step(state: Pix2PixState, real_A, real_B, lr):
        rng, r_pool, r_drop_g, r_drop_d = jax.random.split(state.rng, 4)
        # raw-uint8 loader batches normalize here, inside the one program
        real_A = ops.normalize_u8(real_A)
        real_B = ops.normalize_u8(real_B)
        if cfg.compute_dtype is not None:
            real_A = real_A.astype(cfg.compute_dtype)
            real_B = real_B.astype(cfg.compute_dtype)

        # ---- G forward once, with VJP closure for the later G update
        # (aux carries EMA-updated BatchNorm stats; None for instance norm)
        def g_forward(pg):
            return _apply_net_stats(G, pg, state.stats_G, real_A, True, r_drop_g)

        fake_B, g_vjp, stats_G = jax.vjp(g_forward, state.params_G, has_aux=True)
        fake_B_sg = jax.lax.stop_gradient(fake_B)

        pool_images, pool_count = state.pool_images, state.pool_count
        metrics = {}

        # ---- D update (reference backward_D)
        if cfg.use_gan:
            if cfg.use_condition:
                fake_AB = jnp.concatenate([real_A, fake_B_sg], axis=-1)
                real_AB = jnp.concatenate([real_A, real_B], axis=-1)
            else:
                fake_AB, real_AB = fake_B_sg, real_B
            if cfg.pool_size > 0:
                pool_images, pool_count, fake_AB = pool_query(
                    pool_images, pool_count, fake_AB, r_pool
                )

            def d_loss_fn(pd):
                if cfg.fuse_d_batch:
                    # one D application over [fake; real] — identical math
                    # with per-sample (instance) norm, better MXU batching
                    both = _apply_net(
                        D, pd, jnp.concatenate([fake_AB, real_AB], axis=0), True, r_drop_d
                    )
                    pred_fake, pred_real = _split_scales(both, fake_AB.shape[0])
                    sd = state.stats_D
                else:
                    # sequential fake-then-real: torch backward_D's forward
                    # order, which is also the BatchNorm running-stat order
                    pred_fake, sd = _apply_net_stats(
                        D, pd, state.stats_D, fake_AB, True, r_drop_d
                    )
                    pred_real, sd = _apply_net_stats(
                        D, pd, sd, real_AB, True, r_drop_d
                    )
                loss_fake = ops.gan_loss(pred_fake, False, cfg.gan_mode)
                loss_real = ops.gan_loss(pred_real, True, cfg.gan_mode)
                return 0.5 * (loss_fake + loss_real), (loss_fake, loss_real, sd)

            (loss_D, (loss_D_fake, loss_D_real, stats_D)), grads_D = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_D)
            upd_D, opt_D = adam.update(grads_D, state.opt_D)
            params_D = sgd_apply(state.params_D, upd_D, lr)
            metrics.update(loss_D=loss_D, loss_D_fake=loss_D_fake, loss_D_real=loss_D_real)
        else:
            params_D, opt_D = state.params_D, state.opt_D
            stats_D = state.stats_D
            zero = jnp.zeros((), jnp.float32)
            metrics.update(loss_D=zero, loss_D_fake=zero, loss_D_real=zero)

        # ---- G update against the updated D (reference backward_G ordering)
        # VGG features of the TARGET are a constant of the G update: compute
        # them outside the value_and_grad closure so the backward pass only
        # traverses the fake branch (a 2x cut of the VGG backward; the
        # fused-[fake;real] single application would drag the whole 2B batch
        # through conv transposes and pool select-and-scatters).
        if cfg.use_vgg and vgg is not None:
            feats_real_const = [
                jax.lax.stop_gradient(f) for f in vgg.apply(vgg_params, real_B)
            ]

        def g_loss_from_fake(fb):
            aux = {}
            if cfg.use_gan:
                fake_AB_g = (
                    jnp.concatenate([real_A, fb], axis=-1) if cfg.use_condition else fb
                )
                # reference backward_G runs another train-mode D forward,
                # which is a third BatchNorm running-stat update; stats are
                # stop_gradient'd so the G grad is unaffected
                pred_fake, aux["stats_D"] = _apply_net_stats(
                    D, params_D, stats_D, fake_AB_g, True, r_drop_d
                )
                loss_gan = ops.gan_loss(pred_fake, True, cfg.gan_mode)
            else:
                loss_gan = jnp.zeros((), jnp.float32)
            loss_l1 = ops.l1_loss(fb, real_B)
            if cfg.use_vgg and vgg is not None:
                feats_fake = vgg.apply(vgg_params, fb)
                loss_vgg = ops.perceptual_loss(feats_fake, feats_real_const, num_taps=4)
            else:
                loss_vgg = jnp.zeros((), jnp.float32)
            loss_tv = ops.tv_loss(fb)
            loss_ssim = ops.ssim_loss(real_B, fb)
            total = (
                loss_gan * cfg.w_gan
                + loss_l1
                + loss_vgg * cfg.w_vgg
                + loss_tv * cfg.w_tv
                + cfg.w_ss * loss_ssim
            )
            aux.update(
                loss_G_GAN=loss_gan, loss_G_L1=loss_l1, loss_vgg=loss_vgg,
                loss_tv=loss_tv, loss_ssim=loss_ssim, loss_G=total,
            )
            return total, aux

        (_, g_aux), dfake = jax.value_and_grad(g_loss_from_fake, has_aux=True)(fake_B)
        (grads_G,) = g_vjp(dfake)
        upd_G, opt_G = adam.update(grads_G, state.opt_G)
        params_G = sgd_apply(state.params_G, upd_G, lr)
        stats_D = g_aux.pop("stats_D", stats_D)
        metrics.update(g_aux)

        # ---- on-device quality metrics (reference protocol, no host sync)
        fake_q = ops.metrics.quantize_uint8(fake_B_sg)
        real_q = ops.metrics.quantize_uint8(real_B)
        metrics["psnr"] = ops.psnr_uint8(real_q, fake_q)
        metrics["ssim"] = ops.ssim_uint8(real_q, fake_q)
        metrics = {k: jnp.asarray(v, jnp.float32) for k, v in metrics.items()}

        new_state = Pix2PixState(
            params_G=params_G,
            params_D=params_D,
            opt_G=opt_G,
            opt_D=opt_D,
            pool_images=pool_images,
            pool_count=pool_count,
            rng=rng,
            step=state.step + 1,
            stats_G=stats_G,
            stats_D=stats_D,
        )
        # visuals leave the step in f32: numpy/PIL on the host don't speak
        # bf16, and the cast is one small tensor
        return new_state, metrics, fake_B_sg.astype(jnp.float32)

    return step


class Pix2PixModel(BaseModel):
    """Host-side shell: options -> modules -> state -> fused step."""

    def name(self):
        return "Pix2PixModel"

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        if is_train:
            parser.add_argument(
                "--lambda_L1", type=float, default=100.0,
                help="weight for L1 loss (parity flag; unused by the loss, "
                     "matching reference pix2pix_model.py:70 which defines "
                     "but never applies it)",
            )
        return parser

    def initialize(self, opt):
        BaseModel.initialize(self, opt)
        self.loss_names = ["G_GAN", "G_L1", "D_real", "D_fake"]
        self.visual_names = ["real_A", "fake_B", "real_B"]
        self.model_names = ["G", "D"] if self.isTrain else ["G"]

        dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else None
        self.netG = registry.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.which_model_netG,
            opt.norm, not opt.no_dropout, dtype=dtype,
            remat=getattr(opt, "remat", False),
        )
        rng = jax.random.PRNGKey(getattr(opt, "seed", 20))
        rng, kg, kd, kv, kstate = jax.random.split(rng, 5)
        h, w = opt.fineSize_h, opt.fineSize_w
        vars_G = registry.init_params(
            self.netG, kg, (1, h, w, opt.input_nc), opt.init_type
        )
        params_G = vars_G["params"]
        stats_G = vars_G.get("batch_stats") or None  # --norm batch only

        if self.isTrain:
            use_sigmoid = opt.no_lsgan
            d_in_nc = (
                opt.input_nc + opt.output_nc if opt.use_condition == 1 else opt.output_nc
            )
            self.netD = registry.define_D(
                d_in_nc, opt.ndf, opt.which_model_netD, opt.n_layers_D,
                opt.norm, use_sigmoid, dtype=dtype,
            )
            vars_D = registry.init_params(
                self.netD, kd, (1, h, w, d_in_nc), opt.init_type
            )
            params_D = vars_D["params"]
            stats_D = vars_D.get("batch_stats") or None

            # GAN criterion wiring matches GANLoss(use_lsgan=opt.no_lsgan):
            # default no_lsgan=False -> BCE-with-logits on raw logits.
            # When --no_lsgan is passed the reference both turns on the
            # sigmoid in D and selects MSE -> lsgan on probabilities.
            gan_mode = "lsgan" if opt.no_lsgan else "vanilla"

            self.vgg = Vgg16Features(dtype=dtype, num_taps=4)
            vgg_weights = getattr(opt, "vgg_weights", "")
            if vgg_weights:
                self.vgg_params = load_torchvision_npz(vgg_weights)
            else:
                self.vgg_params = self.vgg.init(kv, jnp.zeros((1, 64, 64, 3)))
                if float(opt.w_vgg) != 0.0:
                    import warnings

                    warnings.warn(
                        "--vgg_weights not given: the perceptual loss is running on "
                        "RANDOM-INIT VGG16 features, which is a materially different "
                        "objective from the reference's pretrained-torchvision loss "
                        "(DSGAN/models/vgg.py:5-28). For reference-parity training, "
                        "convert the torchvision weights once:\n"
                        "  python -c \"import torchvision, torch; "
                        "torch.save(torchvision.models.vgg16(weights='IMAGENET1K_V1')"
                        ".state_dict(), 'vgg16.pth')\"  (on any machine with "
                        "torchvision)\n"
                        "  python -m dsgan_tpu.utils.pth_convert vgg vgg16.pth "
                        "vgg16.npz\n"
                        "then pass --vgg_weights vgg16.npz  (or silence this with "
                        "--w_vgg 0).",
                        stacklevel=2,
                    )

            cfg = Pix2PixConfig(
                gan_mode=gan_mode,
                use_gan=int(opt.use_GAN) == 1,
                use_condition=int(opt.use_condition) == 1,
                pool_size=opt.pool_size,
                w_gan=float(opt.w_gan),
                w_vgg=float(opt.w_vgg),
                w_tv=float(opt.w_tv),
                w_ss=float(opt.w_ss),
                use_vgg=float(opt.w_vgg) != 0.0,
                beta1=opt.beta1,
                fuse_d_batch=opt.norm != "batch",
                compute_dtype=dtype,
            )
            self.cfg = cfg
            adam = make_adam(cfg.beta1)
            pool_images, pool_count = init_pool(
                max(cfg.pool_size, 0), (h, w, d_in_nc), dtype or jnp.float32
            )
            self.state = Pix2PixState(
                params_G=params_G,
                params_D=params_D,
                opt_G=adam.init(params_G),
                opt_D=adam.init(params_D),
                pool_images=pool_images,
                pool_count=pool_count,
                rng=kstate,
                step=jnp.zeros((), jnp.int32),
                stats_G=stats_G,
                stats_D=stats_D,
            )
            self.state = self._place_state(self.state)
            self._raw_step = make_train_step(
                self.netG, self.netD, self.vgg, self.vgg_params, cfg
            )
            self._step_fn = self._jit_step(self._raw_step)
            self._chained_fn = None  # built on first chunk dispatch
        else:
            self.state = Pix2PixState(
                params_G=params_G, params_D=None, opt_G=None, opt_D=None,
                pool_images=None, pool_count=None, rng=kstate,
                step=jnp.zeros((), jnp.int32), stats_G=stats_G,
            )

        # inference uses a forward-only build of the same generator
        # (identical param tree): the fused Pallas block path is train-only
        # — its advantage is the fused backward, and forward-only it loses
        # to XLA (see registry.define_G docstring).
        netG_infer = registry.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.which_model_netG,
            opt.norm, not opt.no_dropout, dtype=dtype,
            remat=getattr(opt, "remat", False), inference=True,
        )
        self._infer_fn = self._jit_infer(
            lambda v, x: _apply_net(
                netG_infer, v["params"], ops.normalize_u8(x), False,
                stats=v.get("batch_stats")
            )
        )
        self.lr = getattr(opt, "lr", 2e-4)

    # -- data in -----------------------------------------------------------
    def set_input(self, input):
        AtoB = self.opt.which_direction == "AtoB"
        self.real_A = self._place_batch(input["A" if AtoB else "B"])
        self.real_B = self._place_batch(input["B" if AtoB else "A"])
        self.image_paths = input.get("A_paths" if AtoB else "B_paths", [])

    def set_input_chunk(self, inputs):
        """Stage a k-item chunk (list of loader batches) as k channel-
        fused per-batch H2D puts (A|B -> one (N,H,W,6) put per sub-step),
        split+stacked INSIDE the jitted program (--steps_per_dispatch).
        One k-stacked put measured ~30x slower to complete through the
        relay, and every put pays a ~120 ms serialized completion event
        once the big program is resident — so minimize puts at the
        proven-fast (few-MB) size (make_fused_chunk_step;
        tools/chunk_trace.py)."""
        AtoB = self.opt.which_direction == "AtoB"
        ka, kb = ("A", "B") if AtoB else ("B", "A")
        self.chunk_AB = [
            self._place_batch(np.concatenate(
                (np.asarray(d[ka]), np.asarray(d[kb])), axis=-1))
            for d in inputs
        ]
        # visuals/anomaly dumps reflect the chunk's LAST sub-batch (host
        # copies — no extra device traffic)
        self.real_A = np.asarray(inputs[-1][ka])
        self.real_B = np.asarray(inputs[-1][kb])
        self.image_paths = inputs[-1].get(ka + "_paths", [])

    # -- step --------------------------------------------------------------
    def optimize_parameters(self):
        self.state, self._metrics, self.fake_B = self._step_fn(
            self.state, self.real_A, self.real_B, jnp.float32(self.lr)
        )

    def optimize_parameters_chunk(self):
        """Run k fused steps in ONE dispatch over the staged chunk.
        Bit-identical to k sequential optimize_parameters calls
        (tests/test_chained_step.py); amortizes the relay's per-sync
        completion-event latency (docs/PERF.md 'End-to-end CLI gap')."""
        k = len(self.chunk_AB)
        if self._chained_fn is None or getattr(self, "_chained_k", None) != k:
            from dsgan_tpu.models.base_model import make_fused_chunk_step

            nc_a = self.opt.input_nc
            nc_b = self.opt.output_nc
            self._chained_fn = self._jit_split_chained_step(
                make_fused_chunk_step(self._raw_step, k, (nc_a, nc_b)), k,
                n_batch_args=1,
            )
            self._chained_k = k
        self.state, ms, self.fake_B = self._chained_fn(
            self.state, *self.chunk_AB, jnp.float32(self.lr)
        )
        # both views computed in-jit — zero host-side slice dispatches
        self._metrics_seq = ms["seq"]  # (k,)-stacked device arrays per key
        self._metrics = ms["last"]

    def forward(self):
        v = {"params": self.state.params_G}
        if self.state.stats_G:
            v["batch_stats"] = self.state.stats_G
        self.fake_B = self._infer_fn(v, self.real_A)
        return self.fake_B

    # -- image getters (reference pix2pix_model.py:292-310) ------------------
    @staticmethod
    def _to_255(x):
        """Batch -> [0,255] float array (uint8 fast-path batches are
        already 0..255; float batches are [-1,1])."""
        x = np.asarray(x)
        if x.dtype == np.uint8:
            return x.astype(np.float32)
        return (x + 1.0) / 2.0 * 255.0

    def get_img_tir(self, input):
        """Place + return the TIR (A) batch scaled to [0,255]
        (reference pix2pix_model.py:292-294 — reads 'A' regardless of
        direction, and primes real_A for get_img_gen)."""
        self.real_A = self._place_batch(input["A"])
        return self._to_255(self.real_A)

    def get_img_gen(self, input):
        """Run G on the previously-placed real_A; return fake in [0,255]
        (reference pix2pix_model.py:296-300)."""
        AtoB = self.opt.which_direction == "AtoB"
        self.real_B = self._place_batch(input["B" if AtoB else "A"])
        self.forward()
        return self._to_255(np.asarray(self.fake_B, np.float32))

    def get_img_label(self, input):
        """Place + return the target (B) batch in [0,255]
        (reference pix2pix_model.py:302-305)."""
        AtoB = self.opt.which_direction == "AtoB"
        self.real_B = self._place_batch(input["B" if AtoB else "A"])
        return self._to_255(self.real_B)

    def get_img_nir(self, input):
        """Place + return the source batch in [0,255]
        (reference pix2pix_model.py:307-310)."""
        AtoB = self.opt.which_direction == "AtoB"
        self.real_A = self._place_batch(input["A" if AtoB else "B"])
        return self._to_255(self.real_A)

    # -- metrics (device-computed; one sync per call) -----------------------
    def cal_ssim(self, input=None):
        return float(np.asarray(self._metrics["ssim"]))

    def cal_psnr(self, input=None):
        return float(np.asarray(self._metrics["psnr"]))

    # -- persistence --------------------------------------------------------
    def _network_params(self):
        nets = {"G": self.state.params_G}
        if self.isTrain:
            nets["D"] = self.state.params_D
        return nets

    def _checkpoint_pytree(self):
        return {
            "state": self.state,
            "lr_last_epoch": np.asarray(self._last_epoch, np.int32),
        }

    def _load_checkpoint_pytree(self, tree):
        self.state = self._place_state(tree["state"])
        self._last_epoch = int(tree["lr_last_epoch"])
        if self.isTrain:
            self._set_lr_from_schedule()

    def load_networks(self, which_epoch):
        if self.isTrain:
            return BaseModel.load_networks(self, which_epoch)
        # inference-only: pull just the generator out of a train checkpoint
        from dsgan_tpu.utils import checkpoint as ckpt

        if which_epoch == "latest":
            which_epoch = ckpt.latest_epoch(self.save_dir)
            if which_epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.save_dir}")
        tree = ckpt.restore_untyped(self.save_dir, which_epoch)
        params_G = self._place_state(
            jax.tree_util.tree_map(jnp.asarray, tree["state"]["params_G"])
        )
        stats_G = tree["state"].get("stats_G") or None
        if stats_G is not None:
            stats_G = self._place_state(
                jax.tree_util.tree_map(jnp.asarray, stats_G)
            )
        self.state = self.state.replace(params_G=params_G, stats_G=stats_G)
        print(f"loaded generator from epoch {which_epoch} checkpoint")
