"""Multi-host initialization wiring (--num_hosts -> jax.distributed).

A real pod slice isn't available, so the test fakes the coordination env
vars and intercepts jax.distributed.initialize, asserting the wiring
passes exactly what a pod launch needs. (The in-slice mesh logic is
covered on the virtual 8-device CPU mesh in test_parallel.py.)
"""

import os

import jax
import pytest

from dsgan_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def _reset_state():
    multihost._initialized = False
    yield
    multihost._initialized = False


def test_single_host_is_noop(monkeypatch):
    called = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.update(kw)
    )
    assert multihost.initialize(1) is False
    assert called == {}


def test_env_var_wiring(monkeypatch):
    called = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.update(kw)
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.2:8476")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert multihost.initialize(4) is True
    assert called == {
        "num_processes": 4,
        "coordinator_address": "10.0.0.2:8476",
        "process_id": 3,
    }
    # idempotent: second call must not re-initialize
    called.clear()
    assert multihost.initialize(4) is True
    assert called == {}


def test_autodetect_passes_only_count(monkeypatch):
    called = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.update(kw)
    )
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    multihost.initialize(8)
    assert called == {"num_processes": 8}


def test_cli_flag_triggers_initialize(monkeypatch):
    called = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.update(kw)
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "coord:1234")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    from dsgan_tpu.options.train_options import TrainOptions

    TrainOptions().parse(argv=[
        "--num_hosts", "2", "--name", "mh",
        "--checkpoints_dir", "/tmp/dsgan_mhtest",
    ])
    assert called.get("num_processes") == 2


def test_primary_helpers():
    assert multihost.process_index() == 0
    assert multihost.process_count() == 1
    assert multihost.is_primary()


def test_platform_flag_sets_jax_config():
    # conftest already pins cpu; the flag must round-trip through
    # jax.config (the env var alone is ineffective under site hooks
    # that register a remote TPU plugin).
    from dsgan_tpu.options.train_options import TrainOptions

    opt = TrainOptions().parse(argv=[
        "--platform", "cpu", "--name", "pf",
        "--checkpoints_dir", "/tmp/dsgan_pftest",
    ])
    assert opt.platform == "cpu"
    assert jax.config.jax_platforms == "cpu"
    assert jax.default_backend() == "cpu"


@pytest.mark.slow
@pytest.mark.parametrize("data_axis,spatial_axis", [("4", "1"), ("2", "2")])
def test_two_process_training_live(tmp_path, data_axis, spatial_axis):
    """The production --num_hosts path run for REAL: two OS processes,
    each with 2 virtual CPU devices, joined by jax.distributed through
    multihost.initialize (env-var wiring), training the fused pix2pix
    step over the global 4-device mesh. The 2x2 case spatially shards
    image rows ACROSS the process boundary — conv halo exchanges ride
    the inter-process fabric. Both ranks must produce identical losses."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    procs = []
    for rank in (0, 1):
        env = dict(os.environ)
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_PROCESS_ID": str(rank),
        })
        procs.append(subprocess.Popen(
            [_sys.executable, worker, str(tmp_path), str(rank),
             data_axis, spatial_axis],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    lines = {}
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("MH_LOSSES"):
                _, rank, payload = ln.split(" ", 2)
                lines[int(rank)] = payload
    # The tested property is the TRAINING result: both ranks must have
    # printed identical finite losses. Exit codes are checked after —
    # a rank that trained fine but tripped the (timing-sensitive)
    # distributed shutdown barrier still printed its line.
    assert set(lines) == {0, 1}, (outs[0][-1500:], outs[1][-1500:])
    assert lines[0] == lines[1], lines
    assert "nan" not in lines[0] and "inf" not in lines[0]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
