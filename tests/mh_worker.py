"""Worker process for tests/test_multihost.py::test_two_process_training_live.

Runs the PRODUCTION multi-host path: options parse triggers
multihost.initialize (from JAX_COORDINATOR_ADDRESS/JAX_PROCESS_ID env),
the model resolves a mesh over the GLOBAL device set (2 processes x 2
CPU devices), and the fused pix2pix train step runs with cross-process
collectives (gloo DCN analog). Prints the per-step losses for the test
to compare across ranks.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ckpt_dir, rank = sys.argv[1], sys.argv[2]
    data_axis = sys.argv[3] if len(sys.argv) > 3 else "4"
    spatial_axis = sys.argv[4] if len(sys.argv) > 4 else "1"
    from dsgan_tpu.options.train_options import TrainOptions

    opt = TrainOptions().parse(argv=[
        "--num_hosts", "2", "--name", f"mh{rank}",
        "--checkpoints_dir", ckpt_dir,
        "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--dtype", "float32", "--batchSize", "4",
        "--data_axis", data_axis, "--spatial_axis", spatial_axis,
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--pool_size", "0", "--w_vgg", "0", "--seed", "20",
    ])
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from dsgan_tpu.models import create_model

    model = create_model(opt)
    model.setup(opt)

    rng = np.random.default_rng(0)  # identical on both ranks
    losses = None
    for _ in range(3):
        a = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
        model.set_input({"A": a, "B": b})
        model.optimize_parameters()
        losses = model.get_current_losses()
    print("MH_LOSSES", jax.process_index(),
          ";".join(f"{k}={float(v):.6f}" for k, v in sorted(losses.items())),
          flush=True)
    # Reach the distributed shutdown barrier TOGETHER: interpreter
    # teardown time is skewed across ranks (e.g. compile-cache writes)
    # and the atexit barrier times out if one rank lags minutes behind.
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
