"""Gate the driver entry points in __graft_entry__.py.

The multichip dryrun must be self-defending: when the container's remote-TPU
relay plugin leaks into the environment (JAX_PLATFORMS=axon via a
sitecustomize on PYTHONPATH), dryrun_multichip must scrub the env and re-run
itself in a CPU subprocess instead of dialing the relay (round-1 failure
mode: MULTICHIP_r01.json ok:false with a libtpu version-mismatch traceback).
"""

import os
import sys

import pytest


def _load_entry():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    return g


@pytest.mark.skipif(os.environ.get("MLVFS_TPU_TEST_ON_TPU") == "1",
                    reason="on-TPU run: the CPU mesh is (correctly) not ready")
def test_cpu_mesh_ready_in_test_env():
    # The test suite runs in the scrubbed 8-device CPU env (conftest.py),
    # so the inline path must be taken — no subprocess overhead.
    g = _load_entry()
    assert g._cpu_mesh_ready(8)


def test_cpu_mesh_ready_rejects_relay_env(monkeypatch):
    g = _load_entry()
    monkeypatch.delenv(g._SUBPROC_MARKER, raising=False)
    # the sitecustomize pins JAX_PLATFORMS=axon at interpreter start; any
    # value other than "cpu" must force the clean-subprocess path
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert not g._cpu_mesh_ready(8)
    monkeypatch.delenv("JAX_PLATFORMS")
    assert not g._cpu_mesh_ready(8)


def test_cpu_mesh_ready_rejects_oversized_mesh():
    g = _load_entry()
    import jax

    assert not g._cpu_mesh_ready(len(jax.devices()) + 1)


def test_dryrun_multichip_runs_inline():
    # Inline (no subprocess) in the clean test env; compiles are served from
    # the persistent cache after the first run.
    g = _load_entry()
    g.dryrun_multichip(8)
