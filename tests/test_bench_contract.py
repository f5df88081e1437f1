"""Driver contract: bench.py prints exactly one JSON line with the
required keys; __graft_entry__ exposes entry() and dryrun_multichip."""
import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_json_contract():
    env = dict(os.environ)
    env.update(BENCH_BATCH="1", BENCH_STEPS="1", BENCH_SIZE="64", BENCH_VGG="0")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import runpy; runpy.run_path('bench.py', run_name='__main__')"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout + out.stderr
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "train_images_per_sec"
    assert rec["value"] > 0


def test_graft_entry_surface():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as ge

        assert callable(ge.entry)
        assert callable(ge.dryrun_multichip)
    finally:
        sys.path.pop(0)
