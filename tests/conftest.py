import os
import sys

# Run the test suite on a virtual 8-device CPU mesh: multi-chip sharding is
# validated without TPU hardware, and CPU keeps compile times low.
#
# This container boots every interpreter with a sitecustomize that registers
# a remote TPU PJRT plugin (JAX_PLATFORMS=axon); merely setting
# JAX_PLATFORMS=cpu here is not enough — backend init still dials the remote
# relay and stalls. So if we detect that environment (and jax has not been
# imported yet), re-exec pytest once with a clean environment.
if (
    os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
    and os.environ.get("MLVFS_TPU_TEST_ON_TPU") != "1"
    and os.environ.get("_MLVFS_TPU_REEXEC") != "1"
    and "jax" not in sys.modules
):
    env = {
        k: v
        for k, v in os.environ.items()
        # drop the remote-TPU plugin configuration entirely (sitecustomize via
        # PYTHONPATH, remote-compile relay knobs) so CPU compiles stay local
        if not (k.startswith(("AXON_", "PALLAS_AXON", "TPU_")) or k == "PYTHONPATH")
    }
    env["_MLVFS_TPU_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo_root)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mlvfs_tpu.format import synth  # noqa: E402


@pytest.fixture
def tmp_clip(tmp_path):
    """A small synthetic 14-bit clip on disk."""
    path = str(tmp_path / "M01-1234.MLV")
    spec = synth.write_mlv(path, width=320, height=96, frames=4)
    return path, spec


@pytest.fixture
def rng():
    return np.random.default_rng(42)
