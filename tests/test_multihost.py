"""2-process ``jax.distributed`` CPU smoke: spawns two
``distributed_worker.py`` processes (2 CPU devices each → a 4-device,
2-host cluster over a localhost gloo rendezvous) and requires both to
finish the full worker program — rendezvous, collectives, per-host data
slicing, a real sharded 2-epoch train with all-process Orbax checkpoint
save, and a resume.  This reaches the multi-host semantics the
single-process 8-device virtual mesh cannot (SURVEY.md §2.2)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(_WORKER)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.distributed
def test_two_process_distributed_train(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(r), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"rank {r} missing marker:\n{out[-4000:]}"


def test_initialize_distributed_reraises_rendezvous_failure(monkeypatch):
    """A genuine rendezvous failure must propagate — swallowing it would
    silently degrade an N-host launch into N independent runs racing on
    the same checkpoint directory (parallel/mesh.py)."""
    import jax

    from pdac_pathological_image_segmentation_tpu.parallel import mesh

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    monkeypatch.setattr(jax.distributed, "is_initialized",
                        lambda: False, raising=False)

    def boom(**kwargs):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="connection refused"):
        mesh.initialize_distributed()


def test_initialize_distributed_tolerates_lost_init_race(monkeypatch):
    """The only swallowed failure is the already-initialized race: if
    is_initialized() turns true after the raise, proceed quietly."""
    import jax

    from pdac_pathological_image_segmentation_tpu.parallel import mesh

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    flags = iter([False, True])  # first check: not yet; after raise: yes
    monkeypatch.setattr(jax.distributed, "is_initialized",
                        lambda: next(flags), raising=False)

    def boom(**kwargs):
        raise RuntimeError("already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    mesh.initialize_distributed()  # must not raise
