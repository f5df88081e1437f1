"""Automated bisect driver for the in-process dryrun_multichip SIGABRT
(VERDICT r3 #7 / r4 #4).

Repeatedly invokes tools/dryrun_abort_repro.py in fresh subprocesses with
different pytest selections and records outcome + exit signal, searching
for the minimal prefix of test FILES whose in-process execution makes a
subsequent `__graft_entry__.dryrun_multichip(8)` abort in the same
interpreter.

Strategy: confirm the full fast lane reproduces, then binary-search the
file-ordered prefix (the abort was observed "late in the suite", i.e. it
is cumulative-state-dependent, so prefix search is the right shape; if
the full run does NOT reproduce, that is itself the result — record it).

Writes a JSONL log to /tmp/dryrun_bisect.jsonl and prints a final
verdict line.

Env: DB_TIMEOUT (per-run seconds, default 1500), DB_MARK (pytest -m,
default "not slow").
"""

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = int(os.environ.get("DB_TIMEOUT", "1500"))
MARK = os.environ.get("DB_MARK", "not slow")
LOG = "/tmp/dryrun_bisect.jsonl"


def run_selection(files, tag):
    cmd = [sys.executable, "-u", os.path.join(REPO, "tools/dryrun_abort_repro.py")]
    cmd += files if files else ["--no-tests"]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=TIMEOUT,
            env={**os.environ, "PYTEST_ADDOPTS": f"-m '{MARK}'"},
        )
        rc = proc.returncode
        out = proc.stdout
        tail = (proc.stdout + proc.stderr)[-2000:]
    except subprocess.TimeoutExpired as e:
        rc = "timeout"
        out = (e.stdout or b"").decode(errors="replace")
        tail = (out + (e.stderr or b"").decode(errors="replace"))[-2000:]
    ok = rc == 0 and "DRYRUN_OK" in out
    rec = {"tag": tag, "n_files": len(files), "files": files,
           "rc": rc, "dryrun_ok": ok, "secs": round(time.time() - t0, 1),
           "tail": tail[-600:]}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    sig = ""
    if isinstance(rc, int) and rc < 0:
        sig = f" (signal {-rc})"
    print(f"[bisect] {tag}: n={len(files)} rc={rc}{sig} "
          f"dryrun_ok={ok} {rec['secs']}s", flush=True)
    return ok


def main():
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    files = [os.path.relpath(f, REPO) for f in files]
    open(LOG, "w").close()

    # control: no tests at all (skippable once known-good: DB_SKIP_CONTROL=1)
    if os.environ.get("DB_SKIP_CONTROL") != "1" and not run_selection([], "control"):
        print("VERDICT: dryrun fails even with NO tests — environment "
              "regression, not suite-state. See log.", flush=True)
        return

    # full fast lane
    if run_selection(files, "full"):
        print("VERDICT: full fast lane no longer reproduces the abort "
              "(dryrun OK after all tests in-process). Record as "
              "not-reproducible at current jax/jaxlib.", flush=True)
        return

    # binary search the minimal failing PREFIX
    lo, hi = 1, len(files)  # invariant: prefix[:hi] fails, prefix[:lo-?) unknown
    # find smallest k such that prefix[:k] fails
    good, bad = 0, len(files)
    while bad - good > 1:
        mid = (good + bad) // 2
        if run_selection(files[:mid], f"prefix_{mid}"):
            good = mid
        else:
            bad = mid
    culprit_prefix = files[:bad]
    print(f"[bisect] minimal failing prefix ends at: {files[bad-1]}", flush=True)

    # is the last file alone sufficient?
    alone = run_selection([files[bad - 1]], "alone")
    print(json.dumps({
        "verdict": "reproduced",
        "minimal_failing_prefix_len": bad,
        "last_file": files[bad - 1],
        "last_file_alone_ok": alone,
    }), flush=True)


if __name__ == "__main__":
    main()
