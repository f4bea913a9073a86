"""Driver-gate regression tests for __graft_entry__.

Round 1 failed its multichip gate because dryrun_multichip initialized the
site TPU plugin (JAX_PLATFORMS env is overridden by the axon plugin) and died
on a libtpu mismatch.  These tests run the entry points the way the driver
does — in a subprocess with no helpful env vars — so the CPU-forcing must be
self-contained.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_dryrun_multichip_forces_cpu_mesh():
    # the driver runs dryrun_multichip(N) in an env where the TPU plugin wins
    # over the JAX_PLATFORMS env var; the function must force a virtual CPU
    # mesh itself.
    code = (
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "import jax\n"
        "assert jax.devices()[0].platform == 'cpu', jax.devices()\n"
        "assert len(jax.devices()) >= 8\n"
        "print('DRYRUN_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "DRYRUN_OK" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_foreign_backend_init():
    # worst case: something already initialized a (possibly non-CPU) backend
    # in-process before dryrun is called; it must recover by clearing
    # backends and reconfiguring.
    code = (
        "import jax\n"
        "jax.devices()\n"  # initialize whatever backend the env picks
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "assert len(jax.devices()) >= 8\n"
        "print('DRYRUN_OK')\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            cwd=REPO,
            env=_scrubbed_env(),
            capture_output=True,
            text=True,
            timeout=600,
        )
    except subprocess.TimeoutExpired:
        # jax.devices() on the site TPU plugin blocks indefinitely when the
        # device tunnel is down — an environment outage, not a repo bug
        # (the CPU-forcing path under test never gets to run)
        pytest.skip("site TPU backend unresponsive (tunnel down)")
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "DRYRUN_OK" in r.stdout
