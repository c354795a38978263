import os

# Defaults for a direct (already clean) run; the re-exec into a clean CPU
# environment lives in the root conftest.py (pytest_cmdline_main hook).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# persistent compile cache: XLA-CPU compiles of the bigger pipelines take
# minutes on this box; cache them across pytest runs
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

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
