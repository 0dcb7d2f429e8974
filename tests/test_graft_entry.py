"""Subprocess tests for the driver-facing __graft_entry__ module.

Round 1's multi-chip gate failed not in the parallelism code but in the
entry point's environment setup (MULTICHIP_r01.json: the sitecustomize
pre-selected the single-chip axon platform and make_mesh got 1 device).
These tests invoke dryrun_multichip exactly the way the driver does — a
fresh `python -c` subprocess with the default environment — so
entry-point environment bugs cannot recur unseen.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Environment as the driver would have it: no test-time overrides,
    axon sitecustomize on the path if present."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    paths = [REPO]
    if os.path.isdir("/root/.axon_site"):
        paths.append("/root/.axon_site")
    env["PYTHONPATH"] = ":".join(paths)
    return env


def test_dryrun_multichip_like_driver():
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_driver_env(),
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"dryrun_multichip failed (rc={proc.returncode}):\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


def test_dryrun_multichip_odd_device_count():
    # n=2 exercises the n_model=1 branch (pure DP, no TP/ring leg)
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_driver_env(),
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"dryrun_multichip(2) failed:\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert "dryrun_multichip OK on 2 devices" in proc.stdout


def test_bench_multichip_harness():
    """The multi-chip scaling harness must run at small scale and report
    mesh-invariant losses (guards the driver-facing sharded step the
    same way test_dryrun_* guards the entry point)."""
    proc = subprocess.run(
        [sys.executable, "bench_multichip.py", "--global-batch", "16",
         "--steps", "2"], cwd=REPO, env=_driver_env(),
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"bench_multichip failed:\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert '"loss_invariant": true' in proc.stdout
