"""BaseModel: shared lifecycle for the training algorithms
(the TPU-native re-design of reference DSGAN/models/base_model.py:18-177).

State is a single pytree (params + optimizer moments + replay pool + RNG +
step) advanced by ONE jitted step function; this class is the thin
host-side shell that carries options, checkpoints, the LR schedule, and
lazily-fetched metrics so the device never syncs per image.
"""

import os
from collections import OrderedDict

import jax
import numpy as np

from dsgan_tpu.utils import checkpoint as ckpt
from dsgan_tpu.utils.util import tensor2im


class AnomalyDetected(RuntimeError):
    """A training metric went NaN/Inf (--detect_anomaly).

    Carries the names of the offending metrics and the path of the
    forensic dump written before raising.
    """

    def __init__(self, bad_metrics, dump_dir):
        self.bad_metrics = list(bad_metrics)
        self.dump_dir = dump_dir
        super().__init__(
            "non-finite training metrics %s — forensic state dumped to %s"
            % (self.bad_metrics, dump_dir)
        )


def make_chained_step(step_fn):
    """k-step dispatch chaining: lax.scan the fused step over k stacked
    batches so the host pays ONE dispatch + ONE H2D sync per k steps.

    ``(state, A[k,B,...], B[k,B,...], ..., lr) ->
      (state, {"seq": metrics_stacked[k], "last": metrics_last},
       *last_batch_outs)``

    The math is exactly k sequential steps — same per-step RNG splits,
    same state threading (bit-equivalence pinned by
    tests/test_chained_step.py). Exists because a relay-attached
    accelerator charges ~100 ms of completion-EVENT latency per blocking
    sync once the big program is resident (measured decomposition:
    docs/PERF.md "End-to-end CLI gap"); chaining amortizes it k-fold.
    Works for any algorithm on the framework-wide step contract
    ``(state, *batches, lr) -> (state, metrics, *batch_outs)``.

    Both metric views are computed INSIDE the jitted program: every
    host-side slice of a device array is an eager dispatch, and on a
    relay-attached device each dispatch is a ~20 ms round-trip — slicing
    ~20 metric keys per chunk on the host would cost more than the
    chaining saves (measured: e2e_chunked 44 img/s with host slices vs
    76 plain; docs/PERF.md).
    """
    import jax.numpy as jnp

    def chained(state, *args):
        batches, lr = args[:-1], args[-1]
        # the scan carry holds the LAST sub-step's per-image outputs;
        # shape them from an abstract eval of one step (no FLOPs)
        out_sig = jax.eval_shape(step_fn, state, *(b[0] for b in batches), lr)
        init_outs = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tuple(out_sig[2:])
        )

        def body(carry, xs):
            res = step_fn(carry[0], *xs, lr)
            return (res[0], tuple(res[2:])), res[1]

        (state, outs), metrics = jax.lax.scan(body, (state, init_outs), batches)
        last = jax.tree_util.tree_map(lambda a: a[-1], metrics)
        return (state, {"seq": metrics, "last": last}) + tuple(outs)

    return chained


def make_fused_chunk_step(step_fn, k, ncs=(3, 3)):
    """make_chained_step fed k channel-FUSED batch arrays: each sub-step's
    batch args concatenated along channels on the host (A|B -> (N,H,W,6))
    so the chunk ships as k puts instead of k*len(ncs).

    ``(state, AB_0..AB_{k-1}, lr) -> same outputs as make_chained_step``

    Why: on a relay-attached device every fresh put's completion event
    serializes at ~120 ms once the big program is resident, gating
    execution (tools/chunk_trace.py: 16 puts -> 2.7-3.1 s wait per chunk
    around 0.93 s of device work). Halving the put count halves that
    floor; the in-jit channel split is a device-local slice. ``ncs`` are
    the channel widths of the step's batch args in order."""
    import jax.numpy as jnp

    chained = make_chained_step(step_fn)
    bounds = [0]
    for c in ncs:
        bounds.append(bounds[-1] + c)

    def fused(state, *args):
        fused_batches, lr = args[:-1], args[-1]
        assert len(fused_batches) == k, (len(fused_batches), k)
        stacked = jnp.stack(fused_batches)  # (k, N, H, W, sum(ncs))
        groups = tuple(
            stacked[..., bounds[i]:bounds[i + 1]] for i in range(len(ncs))
        )
        return chained(state, *groups, lr)

    return fused


class BaseModel:
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        return parser

    def name(self):
        return "BaseModel"

    def initialize(self, opt):
        self.opt = opt
        self.isTrain = opt.isTrain
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        self.loss_names = []
        self.visual_names = []
        self.image_paths = []
        self._metrics = {}
        self._last_epoch = 0  # LambdaLR last_epoch counter
        self.lr = getattr(opt, "lr", 0.0)
        # plateau-policy state (torch ReduceLROnPlateau semantics)
        self._plateau_best = float("inf")
        self._plateau_bad = 0
        self._plateau_scale = 1.0
        # --data_axis/--spatial_axis device mesh, resolved on the REAL path
        # (every step built through _jit_step runs sharded when the mesh is
        # active — the TPU equivalent of the reference wrapping every net
        # in DataParallel, networks.py:73-79). None = single device.
        from dsgan_tpu.parallel import resolve_mesh

        # eval batches are ragged (no drop_last), so inference only uses the
        # spatial axis (H-sharding for 512^2-class images); the data axis
        # shards the fixed-size training batch.
        self.mesh = resolve_mesh(
            getattr(opt, "data_axis", 0) if self.isTrain else 1,
            getattr(opt, "spatial_axis", 1),
            batch_size=getattr(opt, "batchSize", None) if self.isTrain else None,
            height=getattr(opt, "fineSize_h", None),
        )
        if self.mesh is not None:
            d, s = self.mesh.devices.shape
            print(f"device mesh: data={d} x spatial={s} "
                  f"({self.mesh.devices.size} of {len(jax.devices())} devices)")

    # -- mesh plumbing (used by every algorithm's initialize/set_input) -----
    def _jit_step(self, step_fn, n_batch_args=2, n_batch_outs=1):
        """jit the fused train step — over the mesh when one is active."""
        if self.mesh is not None:
            from dsgan_tpu.parallel import make_parallel_step

            return make_parallel_step(step_fn, self.mesh,
                                      n_batch_args=n_batch_args,
                                      n_batch_outs=n_batch_outs)
        return jax.jit(step_fn, donate_argnums=(0,))

    def _jit_chained_step(self, chained_fn, n_batch_args=2, n_batch_outs=1):
        """jit a k-chained step (make_chained_step) — mesh-aware like
        _jit_step; the batch args carry a leading unsharded scan axis."""
        if self.mesh is not None:
            from dsgan_tpu.parallel import make_parallel_chained_step

            return make_parallel_chained_step(chained_fn, self.mesh,
                                              n_batch_args=n_batch_args,
                                              n_batch_outs=n_batch_outs)
        return jax.jit(chained_fn, donate_argnums=(0,))

    def _jit_split_chained_step(self, split_fn, k, n_batch_args=2,
                                n_batch_outs=1):
        """jit a split-input k-chained step (make_fused_chunk_step):
        k*n_batch_args separate batch args, each placed/sharded like a
        plain batch, stacked in-jit."""
        if self.mesh is not None:
            from dsgan_tpu.parallel import make_parallel_split_chained_step

            return make_parallel_split_chained_step(
                split_fn, self.mesh, k, n_batch_args=n_batch_args,
                n_batch_outs=n_batch_outs)
        return jax.jit(split_fn, donate_argnums=(0,))

    def _jit_infer(self, apply_fn):
        """jit a (params, x) generator forward — batch/H sharded on the mesh."""
        if self.mesh is not None:
            from dsgan_tpu.parallel import make_parallel_infer

            return make_parallel_infer(apply_fn, self.mesh)
        return jax.jit(apply_fn)

    def _place_state(self, state):
        """Replicate train state across the mesh (no-op single-device)."""
        if self.mesh is not None:
            from dsgan_tpu.parallel import replicate

            return replicate(state, self.mesh)
        return state

    def _place_batch(self, arr):
        """Device-put an NHWC host batch, N x H sharded when on a mesh.

        uint8 batches (the 3-channel loader fast path) are shipped raw —
        a quarter of the H2D bytes, which matters on relay-attached
        accelerators (~1.4 GB/s measured: 19 ms/step of f32 pixels at the
        default recipe). The [-1,1] normalize happens INSIDE the consuming
        jitted program (ops.normalize_u8 at trace time, keyed on the
        static dtype) — a separate normalize jit would cost one dispatch
        round-trip per tensor per step through the relay."""
        import jax.numpy as jnp

        arr = np.asarray(arr)
        if self.mesh is not None:
            from dsgan_tpu.parallel import shard_batch

            return shard_batch(arr, self.mesh)
        return jnp.asarray(arr)

    def _place_chunk(self, arr):
        """Device-put a k-stacked (k, N, H, W, C) host chunk — ONE H2D
        transfer for k batches (see _place_batch for the uint8 contract)."""
        import jax.numpy as jnp

        arr = np.asarray(arr)
        if self.mesh is not None:
            from dsgan_tpu.parallel import shard_chunk

            return shard_chunk(arr, self.mesh)
        return jnp.asarray(arr)

    # -- lifecycle ---------------------------------------------------------
    def setup(self, opt):
        """Load checkpoint when testing or resuming (reference
        base_model.py:38-45) and prime the LR schedule."""
        if not self.isTrain or getattr(opt, "continue_train", False):
            which = getattr(opt, "which_epoch", "latest")
            self.load_networks(which)
        if self.isTrain:
            self._set_lr_from_schedule()

    def set_input(self, input):
        raise NotImplementedError

    def optimize_parameters(self):
        raise NotImplementedError

    def eval(self):
        """Switch nets to eval mode (reference base_model.py:48-52).

        In this functional design the inference builds (``_infer_fn``)
        already apply with ``train=False`` — dropout off, BatchNorm
        running statistics — so there is no module state to flip; the
        method exists for API parity and simply records the mode."""
        self.is_eval = True

    def test(self):
        """Inference forward (no grads by construction — pure function)."""
        self.forward()

    # -- learning rate (torch LambdaLR semantics, networks.py:33-39) -------
    def _lr_lambda(self, last_epoch):
        opt = self.opt
        num = max(0, last_epoch + 1 + opt.epoch_count - opt.niter)
        return 1.0 - num / float(opt.niter_decay + 1)

    def _set_lr_from_schedule(self):
        policy = getattr(self.opt, "lr_policy", "lambda")
        if policy == "lambda":
            self.lr = self.opt.lr * self._lr_lambda(self._last_epoch)
        elif policy == "step":
            decays = self._last_epoch // self.opt.lr_decay_iters
            self.lr = self.opt.lr * (0.1**decays)
        elif policy == "plateau":
            self.lr = self.opt.lr * self._plateau_scale
        else:
            raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")

    def _plateau_step(self, metric):
        """torch ReduceLROnPlateau with the reference's hyperparameters
        (networks.py:42-44: mode='min', factor=0.2, threshold=0.01,
        patience=5; rel threshold mode): lr *= 0.2 once the metric fails
        to improve past best*(1-0.01) for more than 5 consecutive epochs."""
        if metric is None:
            # no metric supplied: fall back to the last generator loss —
            # the reference's epoch loop never passes one either
            metric = self.get_current_metrics().get("loss_G", None)
        if metric is None:
            return
        metric = float(metric)
        if metric < self._plateau_best * (1.0 - 0.01):
            self._plateau_best = metric
            self._plateau_bad = 0
        else:
            self._plateau_bad += 1
        if self._plateau_bad > 5:
            self._plateau_scale *= 0.2
            self._plateau_bad = 0

    def update_learning_rate(self, metric=None):
        """Step all schedulers at the end of an epoch (base_model.py:68-72).
        ``metric`` feeds the plateau policy (ignored by lambda/step)."""
        self._last_epoch += 1
        if getattr(self.opt, "lr_policy", "lambda") == "plateau":
            self._plateau_step(metric)
        self._set_lr_from_schedule()
        print("learning rate = %.7f" % self.lr)

    # -- introspection -----------------------------------------------------
    def get_current_losses(self):
        """Fetch the last step's losses as floats (one host sync, done at
        print frequency only)."""
        out = OrderedDict()
        for name in self.loss_names:
            key = "loss_" + name
            if key in self._metrics:
                out[name] = float(np.asarray(self._metrics[key]))
        return out

    def get_current_metrics(self):
        return {k: float(np.asarray(v)) for k, v in self._metrics.items()
                if np.asarray(v).ndim == 0}

    def check_anomaly(self, context=""):
        """Failure detection (SURVEY §5: the reference has NONE — a NaN'd
        run trains to completion and saves garbage checkpoints).

        Scans the step's metric scalars for NaN/Inf. Called at print
        frequency, right where metrics are fetched anyway, so it adds no
        device sync; detection latency is bounded by --print_freq steps.
        On detection: write a forensic bundle — the full train state as a
        synchronous checkpoint (label 'anomaly', restorable with
        --which_epoch anomaly for offline inspection) plus the last input
        batch as .npy — then raise AnomalyDetected.
        """
        vals = self.get_current_metrics()
        bad = sorted(k for k, v in vals.items() if not np.isfinite(v))
        if not bad:
            return
        dump_dir = os.path.join(self.save_dir, "anomaly")
        os.makedirs(dump_dir, exist_ok=True)
        try:
            ckpt.save_state(self.save_dir, "anomaly", self._checkpoint_pytree(),
                            async_save=False)
        except NotImplementedError:
            pass
        for name in ("real_A", "real_B"):
            arr = getattr(self, name, None)
            if arr is not None:
                np.save(os.path.join(dump_dir, f"{name}.npy"), np.asarray(arr))
        with open(os.path.join(dump_dir, "report.txt"), "w") as f:
            f.write("context: %s\nnon-finite metrics: %s\nall metrics: %s\n"
                    % (context, bad, vals))
        raise AnomalyDetected(bad, dump_dir)

    def get_current_visuals(self):
        out = OrderedDict()
        for name in self.visual_names:
            val = getattr(self, name, None)
            if val is not None:
                out[name] = tensor2im(val)
        return out

    def print_networks(self, verbose=False):
        for name, params in self._network_params().items():
            n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
            print("[Network %s] Total number of parameters : %.3f M" % (name, n / 1e6))

    def _network_params(self):
        return {}

    # -- persistence -------------------------------------------------------
    def _checkpoint_pytree(self):
        raise NotImplementedError

    def _load_checkpoint_pytree(self, tree):
        raise NotImplementedError

    def save_networks(self, which_epoch):
        k = int(getattr(self.opt, "keep_ckpts", 0) or 0)
        if k > 0:
            # Prune BEFORE issuing the new async save: keep_latest waits for
            # in-flight serialization, so pruning afterwards would block on
            # the save just issued and negate the async overlap. Prune to k
            # (NOT k-1): the new save has not landed yet, and keeping only
            # k-1 would leave a window (the whole async serialization) with
            # fewer than the promised checkpoints — with --keep_ckpts 1 a
            # crash mid-save would leave ZERO. One transient extra dir
            # until the save lands is the price of the safety invariant.
            ckpt.keep_latest(self.save_dir, k)
        path = ckpt.save_state(self.save_dir, which_epoch, self._checkpoint_pytree())
        print(f"saved checkpoint: {path}")

    def load_networks(self, which_epoch):
        if which_epoch == "latest":
            which_epoch = ckpt.latest_epoch(self.save_dir)
            if which_epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.save_dir}")
        tree = ckpt.restore_state(self.save_dir, which_epoch, self._checkpoint_pytree())
        self._load_checkpoint_pytree(tree)
        print(f"loaded checkpoint epoch {which_epoch} from {self.save_dir}")
