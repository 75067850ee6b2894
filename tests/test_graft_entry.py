# -*- coding: utf-8 -*-
"""Driver-contract tests for ``__graft_entry__``.

The driver runs ``entry()`` (compile-check single chip) and
``dryrun_multichip(N)`` in fresh processes with the *ambient* environment —
notably WITHOUT the virtual-mesh XLA flags this test session sets. These
tests reproduce that: each spawns a cold subprocess whose backend exposes a
single device, so ``dryrun_multichip`` must self-provision the virtual mesh
or fail the way round 1 did (MULTICHIP_r01.json: ok=false).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _single_device_env():
    """Environment resembling the driver's: jax available, ONE device."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # strip the 8-device force flag conftest.py injects for this session
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(code, timeout=600):
    return subprocess.run(
        [sys.executable, "-c", code],
        env=_single_device_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_entry_compiles_and_runs():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from __graft_entry__ import entry\n"
        "fn, args = entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('ENTRY_OK')\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ENTRY_OK" in proc.stdout


def test_dryrun_multichip_self_provisions_virtual_mesh():
    # the parent subprocess sees ONE cpu device; dryrun_multichip(8) must
    # still succeed by provisioning the virtual mesh itself
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout
