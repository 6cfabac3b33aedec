"""initialize_multihost behavior (VERDICT r1: the wrapper swallowed every
RuntimeError and had no tests). Real bootstrap failures must propagate;
double-initialization must stay idempotent; plain single-host calls are
no-ops returning the device count."""

import jax
import pytest

from neptune_tpu.parallel import initialize_multihost
from neptune_tpu.parallel import distributed as dist


def test_single_host_noop(monkeypatch):
    # ensure the pod auto-detect path is off regardless of host env
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: called.append(1)
    )
    n = initialize_multihost()
    assert n == len(jax.devices())
    assert not called


def test_already_initialized_is_swallowed(monkeypatch):
    def boom(**kw):
        raise RuntimeError("Distributed system is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    n = initialize_multihost(coordinator_address="10.0.0.1:1234", num_processes=2,
                             process_id=0)
    assert n == len(jax.devices())


def test_real_failure_propagates(monkeypatch):
    def boom(**kw):
        raise RuntimeError("failed to connect to coordinator after 5 attempts")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator"):
        initialize_multihost(coordinator_address="10.0.0.1:1234",
                             num_processes=2, process_id=0)


def test_pod_autodetect_uses_env(monkeypatch):
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "head:8476")
    called = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda: called.append(1))
    initialize_multihost()
    assert called == [1]
    assert dist._looks_like_pod()
