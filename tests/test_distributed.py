"""initialize_cluster coverage (VERDICT r2 item 9).

The reference has no distributed backend (SURVEY.md section 2); ours is a
thin, env-driven wrapper over ``jax.distributed``.  Tier 1: unit tests of
the no-op / env-driven / already-initialized decision logic (mocked
``jax.distributed.initialize``).  Tier 2: a REAL two-process CPU cluster
smoke -- both processes rendezvous at a local coordinator and must agree
on process_count == 2 and see both CPU devices globally.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_single_process_is_noop(monkeypatch):
    from chiron_tpu.parallel import distributed

    for v in ("TPU_WORKER_HOSTNAMES", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    called = {}

    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.setdefault("args", kw),
    )
    assert distributed.initialize_cluster() is False
    assert "args" not in called


def test_env_driven_initialization(monkeypatch):
    from chiron_tpu.parallel import distributed

    import jax

    called = {}
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.setdefault("args", kw),
    )
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "10.0.0.1,10.0.0.2")
    assert distributed.initialize_cluster() is True
    assert called["args"] == dict(
        coordinator_address=None, num_processes=None, process_id=None
    )


def test_already_initialized_is_tolerated(monkeypatch):
    from chiron_tpu.parallel import distributed

    import jax

    def boom(**kw):
        raise RuntimeError("distributed runtime already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert distributed.initialize_cluster(
        coordinator_address="127.0.0.1:1", num_processes=2, process_id=0
    ) is True


_WORKER = """
import sys
from chiron_tpu.parallel import distributed
import jax

addr, pid = sys.argv[1], int(sys.argv[2])
ok = distributed.initialize_cluster(
    coordinator_address=addr, num_processes=2, process_id=pid)
assert ok is True
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.devices()
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_cluster_smoke():
    """Two real processes rendezvous via jax.distributed on CPU: the
    global device view must span both processes."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(i)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (i, err[-2000:])
        assert f"WORKER_OK {i}" in out, (i, out, err[-500:])
