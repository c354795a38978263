"""Root conftest: re-exec the test run in a clean CPU-JAX environment.

This container boots every interpreter with a remote-TPU PJRT plugin
(JAX_PLATFORMS=axon via a sitecustomize on PYTHONPATH). Tests must run on a
local 8-device virtual CPU mesh instead: remote compiles are slow/flaky and
merely setting JAX_PLATFORMS=cpu still dials the relay. A pytest plugin also
imports jax before conftests load, so in-process configuration is too late —
the only reliable fix is re-exec'ing pytest with a clean environment.

The re-exec must happen through pytest_cmdline_main so the capture manager
can be stopped first: pytest's fd-level capture has already pointed fd 1/2
at deleted temp files by the time conftests load, and an execve that inherits
those fds loses all output.
"""

import os
import sys


def _needs_reexec() -> bool:
    return (
        os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
        and os.environ.get("MLVFS_TPU_TEST_ON_TPU") != "1"
        and os.environ.get("_MLVFS_TPU_REEXEC") != "1"
    )


def pytest_cmdline_main(config):
    if not _needs_reexec():
        return None
    env = {
        k: v
        for k, v in os.environ.items()
        # drop the remote-TPU plugin configuration (sitecustomize via
        # PYTHONPATH, remote-compile relay knobs) so CPU compiles stay local
        if not (k.startswith(("AXON_", "PALLAS_AXON", "TPU_")) or k == "PYTHONPATH")
    }
    env["_MLVFS_TPU_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    repo_root = os.path.dirname(os.path.abspath(__file__))
    os.chdir(repo_root)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
