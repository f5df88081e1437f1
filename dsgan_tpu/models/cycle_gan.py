"""CycleGAN training algorithm as one fused XLA step.

The reference ships this capability broken (mixed tab/space indentation ->
IndentationError, unresolvable vgg import; cycle_gan_model.py:66-68,6).
This is the working TPU-native rebuild of its training logic
(cycle_gan_model.py:84-159):

  forward:  fake_B=G_A(A), rec_A=G_B(fake_B), fake_A=G_B(B), rec_B=G_A(fake_A)
  G update FIRST (with the current Ds), joint Adam over G_A+G_B:
      GAN(D_A(fake_B),1) + GAN(D_B(fake_A),1)
      + L1(rec_A,A)*lambda_A + L1(rec_B,B)*lambda_B
      + L1(G_A(B),B)*lambda_B*lambda_idt + L1(G_B(A),A)*lambda_A*lambda_idt
      + TV(fake_B)/(256*256)
  then D updates with per-domain replay pools, joint Adam over D_A+D_B.
  GAN criterion: LSGAN by default (use_lsgan = not no_lsgan — note this is
  the opposite default from the pix2pix path, matching the reference).
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dsgan_tpu import ops
from dsgan_tpu.models import registry
from dsgan_tpu.models.base_model import BaseModel
from dsgan_tpu.models.pix2pix import _apply_net, _apply_net_stats, make_adam
from dsgan_tpu.utils.image_pool import init_pool, pool_query


@struct.dataclass
class CycleGANState:
    params_G_A: Any
    params_G_B: Any
    params_D_A: Any
    params_D_B: Any
    opt_G: Any
    opt_D: Any
    pool_A_images: Any
    pool_A_count: Any
    pool_B_images: Any
    pool_B_count: Any
    rng: Any
    step: Any
    # BatchNorm running averages (--norm batch); None for instance/none
    stats_G_A: Any = None
    stats_G_B: Any = None
    stats_D_A: Any = None
    stats_D_B: Any = None


@dataclasses.dataclass(frozen=True)
class CycleGANConfig:
    gan_mode: str = "lsgan"
    pool_size: int = 50
    lambda_A: float = 10.0
    lambda_B: float = 10.0
    lambda_identity: float = 0.5
    beta1: float = 0.5


def make_cyclegan_step(G_A, G_B, D_A, D_B, cfg: CycleGANConfig):
    adam = make_adam(cfg.beta1)

    def sgd_apply(params, updates, lr):
        return jax.tree_util.tree_map(lambda p, u: p - lr * u.astype(p.dtype), params, updates)

    def step(state: CycleGANState, real_A, real_B, lr):
        rng, r_pool_a, r_pool_b, r_drop = jax.random.split(state.rng, 4)
        # raw-uint8 loader batches normalize here, inside the one program
        real_A = ops.normalize_u8(real_A)
        real_B = ops.normalize_u8(real_B)

        # ---- G losses + grads (joint over both generators); BatchNorm
        # running stats (when --norm batch) chain through the applications
        # in program order and leave via aux, stop_gradient'd
        def g_loss_fn(pgs):
            pg_a, pg_b = pgs
            fake_B, sga = _apply_net_stats(G_A, pg_a, state.stats_G_A, real_A, True, r_drop)
            rec_A, sgb = _apply_net_stats(G_B, pg_b, state.stats_G_B, fake_B, True, r_drop)
            fake_A, sgb = _apply_net_stats(G_B, pg_b, sgb, real_B, True, r_drop)
            rec_B, sga = _apply_net_stats(G_A, pg_a, sga, fake_A, True, r_drop)

            if cfg.lambda_identity > 0:
                idt_A, sga = _apply_net_stats(G_A, pg_a, sga, real_B, True, r_drop)
                loss_idt_A = ops.l1_loss(idt_A, real_B) * cfg.lambda_B * cfg.lambda_identity
                idt_B, sgb = _apply_net_stats(G_B, pg_b, sgb, real_A, True, r_drop)
                loss_idt_B = ops.l1_loss(idt_B, real_A) * cfg.lambda_A * cfg.lambda_identity
            else:
                loss_idt_A = loss_idt_B = jnp.zeros((), jnp.float32)

            pred_a, sda = _apply_net_stats(
                D_A, state.params_D_A, state.stats_D_A, fake_B, True
            )
            loss_G_A = ops.gan_loss(pred_a, True, cfg.gan_mode)
            pred_b, sdb = _apply_net_stats(
                D_B, state.params_D_B, state.stats_D_B, fake_A, True
            )
            loss_G_B = ops.gan_loss(pred_b, True, cfg.gan_mode)
            loss_cycle_A = ops.l1_loss(rec_A, real_A) * cfg.lambda_A
            loss_cycle_B = ops.l1_loss(rec_B, real_B) * cfg.lambda_B
            loss_tv = ops.tv_loss(fake_B, divisor=256 * 256)
            total = (
                loss_G_A + loss_G_B + loss_cycle_A + loss_cycle_B
                + loss_idt_A + loss_idt_B + loss_tv
            )
            aux = dict(
                loss_G_A=loss_G_A, loss_G_B=loss_G_B,
                loss_cycle_A=loss_cycle_A, loss_cycle_B=loss_cycle_B,
                loss_idt_A=loss_idt_A, loss_idt_B=loss_idt_B, loss_tv=loss_tv,
                fake_A=jax.lax.stop_gradient(fake_A),
                fake_B=jax.lax.stop_gradient(fake_B),
                rec_A=jax.lax.stop_gradient(rec_A),
                rec_B=jax.lax.stop_gradient(rec_B),
                stats=(sga, sgb, sda, sdb),
            )
            return total, aux

        (loss_G, aux), grads_G = jax.value_and_grad(g_loss_fn, has_aux=True)(
            (state.params_G_A, state.params_G_B)
        )
        upd_G, opt_G = adam.update(grads_G, state.opt_G)
        params_G_A, params_G_B = sgd_apply(
            (state.params_G_A, state.params_G_B), upd_G, lr
        )

        # ---- D updates with per-domain pools
        pool_B_images, pool_B_count, pooled_fake_B = pool_query(
            state.pool_B_images, state.pool_B_count, aux["fake_B"], r_pool_b
        ) if cfg.pool_size > 0 else (state.pool_B_images, state.pool_B_count, aux["fake_B"])
        pool_A_images, pool_A_count, pooled_fake_A = pool_query(
            state.pool_A_images, state.pool_A_count, aux["fake_A"], r_pool_a
        ) if cfg.pool_size > 0 else (state.pool_A_images, state.pool_A_count, aux["fake_A"])

        stats_G_A, stats_G_B, stats_D_A, stats_D_B = aux.pop("stats")

        def d_loss_fn(pds):
            pd_a, pd_b = pds
            pr_a, sda = _apply_net_stats(D_A, pd_a, stats_D_A, real_B, True)
            pf_a, sda = _apply_net_stats(D_A, pd_a, sda, pooled_fake_B, True)
            loss_D_A = 0.5 * (
                ops.gan_loss(pr_a, True, cfg.gan_mode)
                + ops.gan_loss(pf_a, False, cfg.gan_mode)
            )
            pr_b, sdb = _apply_net_stats(D_B, pd_b, stats_D_B, real_A, True)
            pf_b, sdb = _apply_net_stats(D_B, pd_b, sdb, pooled_fake_A, True)
            loss_D_B = 0.5 * (
                ops.gan_loss(pr_b, True, cfg.gan_mode)
                + ops.gan_loss(pf_b, False, cfg.gan_mode)
            )
            return loss_D_A + loss_D_B, (loss_D_A, loss_D_B, (sda, sdb))

        (_, (loss_D_A, loss_D_B, (stats_D_A, stats_D_B))), grads_D = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(
            (state.params_D_A, state.params_D_B)
        )
        upd_D, opt_D = adam.update(grads_D, state.opt_D)
        params_D_A, params_D_B = sgd_apply(
            (state.params_D_A, state.params_D_B), upd_D, lr
        )

        fake_q = ops.metrics.quantize_uint8(aux["fake_B"])
        real_q = ops.metrics.quantize_uint8(real_B)
        metrics = {
            "loss_G": loss_G,
            "loss_G_A": aux["loss_G_A"], "loss_G_B": aux["loss_G_B"],
            "loss_cycle_A": aux["loss_cycle_A"], "loss_cycle_B": aux["loss_cycle_B"],
            "loss_idt_A": aux["loss_idt_A"], "loss_idt_B": aux["loss_idt_B"],
            "loss_tv": aux["loss_tv"],
            "loss_D_A": loss_D_A, "loss_D_B": loss_D_B,
            "psnr": ops.psnr_uint8(real_q, fake_q),
            "ssim": ops.ssim_uint8(real_q, fake_q),
        }
        visuals = {k: aux[k] for k in ("fake_A", "fake_B", "rec_A", "rec_B")}

        new_state = CycleGANState(
            params_G_A=params_G_A, params_G_B=params_G_B,
            params_D_A=params_D_A, params_D_B=params_D_B,
            opt_G=opt_G, opt_D=opt_D,
            pool_A_images=pool_A_images, pool_A_count=pool_A_count,
            pool_B_images=pool_B_images, pool_B_count=pool_B_count,
            rng=rng, step=state.step + 1,
            stats_G_A=stats_G_A, stats_G_B=stats_G_B,
            stats_D_A=stats_D_A, stats_D_B=stats_D_B,
        )
        return new_state, metrics, visuals

    return step


class CycleGANModel(BaseModel):
    def name(self):
        return "CycleGANModel"

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0,
                                help="weight for cycle loss (A -> B -> A)")
            parser.add_argument("--lambda_B", type=float, default=10.0,
                                help="weight for cycle loss (B -> A -> B)")
            parser.add_argument("--lambda_identity", type=float, default=0.5,
                                help="identity mapping loss weight scale")
        return parser

    def initialize(self, opt):
        BaseModel.initialize(self, opt)
        self.loss_names = ["D_A", "G_A", "cycle_A", "idt_A", "D_B", "G_B", "cycle_B", "idt_B"]
        visual_names_A = ["real_A", "fake_B", "rec_A"]
        visual_names_B = ["real_B", "fake_A", "rec_B"]
        if self.isTrain and opt.lambda_identity > 0.0:
            pass  # idt visuals omitted from the fused step outputs
        self.visual_names = visual_names_A + visual_names_B
        self.model_names = (
            ["G_A", "G_B", "D_A", "D_B"] if self.isTrain else ["G_A", "G_B"]
        )

        dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else None
        self.netG_A = registry.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.which_model_netG,
            opt.norm, not opt.no_dropout, dtype=dtype,
        )
        self.netG_B = registry.define_G(
            opt.output_nc, opt.input_nc, opt.ngf, opt.which_model_netG,
            opt.norm, not opt.no_dropout, dtype=dtype,
        )
        rng = jax.random.PRNGKey(getattr(opt, "seed", 20))
        rng, ka, kb, kda, kdb, ks = jax.random.split(rng, 6)
        h, w = opt.fineSize_h, opt.fineSize_w
        vars_G_A = registry.init_params(self.netG_A, ka, (1, h, w, opt.input_nc), opt.init_type)
        vars_G_B = registry.init_params(self.netG_B, kb, (1, h, w, opt.output_nc), opt.init_type)
        params_G_A = vars_G_A["params"]
        params_G_B = vars_G_B["params"]
        stats_G_A = vars_G_A.get("batch_stats") or None  # --norm batch only
        stats_G_B = vars_G_B.get("batch_stats") or None

        if self.isTrain:
            use_sigmoid = opt.no_lsgan
            self.netD_A = registry.define_D(
                opt.output_nc, opt.ndf, opt.which_model_netD, opt.n_layers_D,
                opt.norm, use_sigmoid, dtype=dtype,
            )
            self.netD_B = registry.define_D(
                opt.input_nc, opt.ndf, opt.which_model_netD, opt.n_layers_D,
                opt.norm, use_sigmoid, dtype=dtype,
            )
            vars_D_A = registry.init_params(self.netD_A, kda, (1, h, w, opt.output_nc), opt.init_type)
            vars_D_B = registry.init_params(self.netD_B, kdb, (1, h, w, opt.input_nc), opt.init_type)
            params_D_A = vars_D_A["params"]
            params_D_B = vars_D_B["params"]
            stats_D_A = vars_D_A.get("batch_stats") or None
            stats_D_B = vars_D_B.get("batch_stats") or None

            # use_lsgan = not no_lsgan (cycle_gan_model.py:63) — LSGAN default
            cfg = CycleGANConfig(
                gan_mode="vanilla" if opt.no_lsgan else "lsgan",
                pool_size=opt.pool_size,
                lambda_A=opt.lambda_A,
                lambda_B=opt.lambda_B,
                lambda_identity=opt.lambda_identity,
                beta1=opt.beta1,
            )
            self.cfg = cfg
            adam = make_adam(cfg.beta1)
            pa_img, pa_cnt = init_pool(max(cfg.pool_size, 0), (h, w, opt.input_nc))
            pb_img, pb_cnt = init_pool(max(cfg.pool_size, 0), (h, w, opt.output_nc))
            self.state = CycleGANState(
                params_G_A=params_G_A, params_G_B=params_G_B,
                params_D_A=params_D_A, params_D_B=params_D_B,
                opt_G=adam.init((params_G_A, params_G_B)),
                opt_D=adam.init((params_D_A, params_D_B)),
                pool_A_images=pa_img, pool_A_count=pa_cnt,
                pool_B_images=pb_img, pool_B_count=pb_cnt,
                rng=ks, step=jnp.zeros((), jnp.int32),
                stats_G_A=stats_G_A, stats_G_B=stats_G_B,
                stats_D_A=stats_D_A, stats_D_B=stats_D_B,
            )
            self.state = self._place_state(self.state)
            self._raw_step = make_cyclegan_step(
                self.netG_A, self.netG_B, self.netD_A, self.netD_B, cfg
            )
            self._step_fn = self._jit_step(self._raw_step)
            self._chained_fn = None  # built on first chunk dispatch
        else:
            self.state = CycleGANState(
                params_G_A=params_G_A, params_G_B=params_G_B,
                params_D_A=None, params_D_B=None, opt_G=None, opt_D=None,
                pool_A_images=None, pool_A_count=None,
                pool_B_images=None, pool_B_count=None,
                rng=ks, step=jnp.zeros((), jnp.int32),
                stats_G_A=stats_G_A, stats_G_B=stats_G_B,
            )

        self._infer_A = self._jit_infer(
            lambda v, x: _apply_net(
                self.netG_A, v["params"], ops.normalize_u8(x), False,
                stats=v.get("batch_stats")
            )
        )
        self._infer_B = self._jit_infer(
            lambda v, x: _apply_net(
                self.netG_B, v["params"], ops.normalize_u8(x), False,
                stats=v.get("batch_stats")
            )
        )
        self.lr = getattr(opt, "lr", 2e-4)

    def set_input(self, input):
        AtoB = self.opt.which_direction == "AtoB"
        self.real_A = self._place_batch(input["A" if AtoB else "B"])
        self.real_B = self._place_batch(input["B" if AtoB else "A"])
        self.image_paths = input.get("A_paths" if AtoB else "B_paths", [])

    def optimize_parameters(self):
        self.state, self._metrics, visuals = self._step_fn(
            self.state, self.real_A, self.real_B, jnp.float32(self.lr)
        )
        for k, v in visuals.items():
            setattr(self, k, v)

    def set_input_chunk(self, inputs):
        """Stage a k-item chunk as k channel-fused per-batch H2D puts
        (A|B), split+stacked in-jit (--steps_per_dispatch; see
        Pix2PixModel.set_input_chunk for the relay measurement)."""
        AtoB = self.opt.which_direction == "AtoB"
        ka, kb = ("A", "B") if AtoB else ("B", "A")
        self.chunk_AB = [
            self._place_batch(np.concatenate(
                (np.asarray(d[ka]), np.asarray(d[kb])), axis=-1))
            for d in inputs
        ]
        self.real_A = np.asarray(inputs[-1][ka])
        self.real_B = np.asarray(inputs[-1][kb])
        self.image_paths = inputs[-1].get(ka + "_paths", [])

    def optimize_parameters_chunk(self):
        """k fused joint G_A/G_B + D_A/D_B steps in ONE dispatch —
        bit-identical to k sequential steps (tests/test_chained_step.py)."""
        k = len(self.chunk_AB)
        if self._chained_fn is None or getattr(self, "_chained_k", None) != k:
            from dsgan_tpu.models.base_model import make_fused_chunk_step

            self._chained_fn = self._jit_split_chained_step(
                make_fused_chunk_step(
                    self._raw_step, k,
                    (self.opt.input_nc, self.opt.output_nc)), k,
                n_batch_args=1,
            )
            self._chained_k = k
        self.state, ms, visuals = self._chained_fn(
            self.state, *self.chunk_AB, jnp.float32(self.lr)
        )
        # both views computed in-jit — zero host-side slice dispatches
        self._metrics_seq = ms["seq"]
        self._metrics = ms["last"]
        for k, v in visuals.items():
            setattr(self, k, v)

    def forward(self):
        va = {"params": self.state.params_G_A}
        vb = {"params": self.state.params_G_B}
        if self.state.stats_G_A:
            va["batch_stats"] = self.state.stats_G_A
        if self.state.stats_G_B:
            vb["batch_stats"] = self.state.stats_G_B
        self.fake_B = self._infer_A(va, self.real_A)
        self.rec_A = self._infer_B(vb, self.fake_B)
        self.fake_A = self._infer_B(vb, self.real_B)
        self.rec_B = self._infer_A(va, self.fake_A)
        return self.fake_B

    def cal_ssim(self, input=None):
        return float(np.asarray(self._metrics["ssim"]))

    def cal_psnr(self, input=None):
        return float(np.asarray(self._metrics["psnr"]))

    def _network_params(self):
        nets = {"G_A": self.state.params_G_A, "G_B": self.state.params_G_B}
        if self.isTrain:
            nets["D_A"] = self.state.params_D_A
            nets["D_B"] = self.state.params_D_B
        return nets

    def _checkpoint_pytree(self):
        return {"state": self.state, "lr_last_epoch": np.asarray(self._last_epoch, np.int32)}

    def _load_checkpoint_pytree(self, tree):
        self.state = self._place_state(tree["state"])
        self._last_epoch = int(tree["lr_last_epoch"])
        if self.isTrain:
            self._set_lr_from_schedule()

    def load_networks(self, which_epoch):
        if self.isTrain:
            return BaseModel.load_networks(self, which_epoch)
        from dsgan_tpu.utils import checkpoint as ckpt

        if which_epoch == "latest":
            which_epoch = ckpt.latest_epoch(self.save_dir)
        tree = ckpt.restore_untyped(self.save_dir, which_epoch)

        def _maybe(t):
            return jax.tree_util.tree_map(jnp.asarray, t) if t else None

        self.state = self.state.replace(
            params_G_A=jax.tree_util.tree_map(jnp.asarray, tree["state"]["params_G_A"]),
            params_G_B=jax.tree_util.tree_map(jnp.asarray, tree["state"]["params_G_B"]),
            stats_G_A=_maybe(tree["state"].get("stats_G_A")),
            stats_G_B=_maybe(tree["state"].get("stats_G_B")),
        )
        print(f"loaded generators from epoch {which_epoch} checkpoint")
